package graft.io

import java.io.InputStream

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTQ reader/writer (ref: seqtables/io/read_sequences.py:11-59
  * read_fastq — pandas line reader grouping records by line_no % 4 — and
  * write_sequences.py:1-8 seqs_to_fastq).
  *
  * Shuffle-free split reader. FASTQ's wrinkle is that '@' can open a
  * QUALITY line, so an arbitrary byte offset can't tell header from
  * quality by prefix alone — but the 4-line structure disambiguates within
  * one record: a line is a header iff it starts with '@' AND the line two
  * below starts with '+' (sequence lines are alphabet letters, never '+',
  * so a quality-line false '@' fails the check). Each task therefore:
  * seeks to its split, discards the partial line, resyncs forward to the
  * first true record start, and assembles consecutive 4-line records,
  * reading past the split end to finish its last record (records are owned
  * by the split containing their first byte — the classic Hadoop text-split
  * contract, one record-length of overread per task).
  *
  * Scan parallelism is total bytes / `splitSize` with NO exchange in the
  * plan (the round-1 version moved every byte through a full shuffle just
  * to group lines by index — and a global line index also silently
  * misassembles multi-file inputs whose line counts aren't multiples of 4;
  * per-file offsets make that impossible). Gzipped inputs are detected by
  * suffix and read as one split per file (gzip is not splittable).
  * Truncated trailing records fail loudly.
  */
object Fastq {

  /** Output: (read_id, seq, qual). */
  def read(
      spark: SparkSession,
      path: String,
      splitSize: Long = 128L * 1024 * 1024): DataFrame = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile).toSeq
        else Seq(st)
      }
      .filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
    val splits: Seq[(String, Long, Long, Boolean)] = statuses.toSeq.flatMap { st =>
      val p = st.getPath.toString
      val len = st.getLen
      if (p.endsWith(".gz")) Seq((p, 0L, Long.MaxValue, true))
      else (0L until math.max(len, 1L) by splitSize).map { off =>
        (p, off, math.min(off + splitSize, len), false)
      }
    }
    // ship the SESSION Hadoop conf to executors (a bare new Configuration()
    // would drop spark.hadoop.* settings — object-store credentials,
    // custom filesystems — so listing would work and opening would not)
    val serConf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(splits.size, 1))
      .mapPartitions { it =>
        it.flatMap { case (p, start, end, gz) =>
          val hp = new Path(p)
          val stream = hp.getFileSystem(serConf.value).open(hp)
          if (gz) {
            val in = new java.util.zip.GZIPInputStream(stream)
            splitRecords(in, 0L, Long.MaxValue, 0L)
          } else {
            // start one byte early: if the split begins exactly at a line
            // start, the discarded "partial line" is just the previous
            // line's '\n' and nothing real is skipped
            val seekTo = math.max(0L, start - 1)
            stream.seek(seekTo)
            splitRecords(stream, start, end, seekTo)
          }
        }
      }
    spark.createDataFrame(rdd).toDF("read_id", "seq", "qual")
  }

  /** Assemble records whose header line starts in [splitStart, splitEnd)
    * from a stream positioned at `streamPos` (≤ splitStart).
    */
  private[io] def splitRecords(
      in: InputStream,
      splitStart: Long,
      splitEnd: Long,
      streamPos: Long): Iterator[(String, String, String)] = {
    val r = new OffsetLineReader(in, streamPos)
    // abandoned iterators (limit/take over many splits) never reach the
    // close() below — release the stream at task end regardless
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => r.close()))
    if (splitStart > 0) r.readLine() // discard the partial line
    val buf = scala.collection.mutable.Queue.empty[(Long, String)]
    def fill(n: Int): Unit = {
      var more = true
      while (buf.size < n && more) {
        val l = r.readLine()
        if (l == null) more = false else buf += l
      }
    }
    // resync: first line j with '@' prefix whose j+2 line starts with '+'
    fill(3)
    var synced = false
    while (!synced && buf.nonEmpty && buf.head._1 < splitEnd) {
      if (buf.head._2.startsWith("@") && buf.size >= 3 && buf(2)._2.startsWith("+"))
        synced = true
      else { buf.dequeue(); fill(3) }
    }
    new Iterator[(String, String, String)] {
      def hasNext: Boolean = {
        fill(4)
        if (buf.isEmpty || buf.head._1 >= splitEnd) {
          // non-final splits stop mid-file and never reach EOF — close the
          // stream here or every split task leaks one fd/connection
          r.close()
          false
        } else if (buf.size < 4) {
          if (buf.forall(_._2.isEmpty)) { r.close(); false } // trailing blank line(s)
          else {
            r.close()
            throw new IllegalStateException(
              s"truncated FASTQ record at offset ${buf.head._1}: " +
                buf.map(_._2).mkString("|"))
          }
        } else true
      }
      def next(): (String, String, String) = {
        val h = buf.dequeue()._2
        val s = buf.dequeue()._2
        buf.dequeue() // '+' line
        val q = buf.dequeue()._2
        (h.stripPrefix("@").split("\\s+", 2)(0), s, q)
      }
    }
  }

  /** Byte-offset-tracking ASCII line reader ('\n' terminated, '\r' stripped). */
  private final class OffsetLineReader(in: InputStream, startPos: Long) {
    private var pos = startPos
    private val buf = new Array[Byte](64 * 1024)
    private var bufLen = 0
    private var bufPos = 0
    private var eof = false

    /** Idempotent; latches EOF so later readLine() calls stay null. */
    def close(): Unit = {
      if (!eof) { eof = true; try in.close() catch { case _: java.io.IOException => } }
    }

    /** (lineStartOffset, line) or null at EOF (latched — safe to re-call). */
    def readLine(): (Long, String) = {
      if (eof) return null
      val start = pos
      val sb = new java.lang.StringBuilder()
      var done = false
      var sawAny = false
      while (!done) {
        if (bufPos == bufLen) {
          bufLen = in.read(buf)
          bufPos = 0
          if (bufLen <= 0) { done = true; eof = true; in.close() }
        } else {
          val b = buf(bufPos); bufPos += 1; pos += 1
          sawAny = true
          if (b == '\n') done = true else sb.append(b.toChar)
        }
      }
      if (!sawAny) null
      else {
        var s = sb.toString
        if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s = s.substring(0, s.length - 1)
        (start, s)
      }
    }
  }

  /** S7 `seqs_to_fastq`: write (read_id, seq, qual) rows as FASTQ text. */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat(
      lit("@"), col("read_id"), lit("\n"),
      col("seq"), lit("\n+\n"),
      col("qual")).as("value"))
      .write.mode("overwrite").text(path)
}
