package graft.io

import java.io.InputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC 1.0 reader/writer (ISO 28500 — the CommonCrawl container, the
  * entry format of every web-scale training-data pipeline; no reference
  * counterpart, part of the §2.12 web layer).
  *
  * Record layout: a `WARC/1.0` version line, CRLF header lines
  * (`Name: value`) including a mandatory `Content-Length`, a blank line,
  * exactly Content-Length payload BYTES, then CRLF CRLF. Payloads are
  * arbitrary binary.
  *
  * Shuffle-free split reader, the [[Fastq]]/[[BamScan]] discipline:
  * records are owned by the split containing the first byte of their
  * version line; a task seeks to its split start, discards the partial
  * line, and resyncs to the next `WARC/1.0` line whose following lines
  * VALIDATE as a header block (well-formed `Name: value` lines up to a
  * blank line, with a parseable Content-Length) — from there it walks
  * records by declared length, so payload bytes that merely *contain*
  * "WARC/1.0" are never re-inspected. The resync validation makes a
  * false sync into a payload astronomically unlikely for real content
  * but not impossible (a payload embedding a byte-exact WARC record is
  * indistinguishable mid-stream — CommonCrawl sidesteps this by gzipping
  * each record as its own member; this reader takes `.warc.gz` files
  * whole-file for the same reason, gzip not being splittable anyway).
  */
object Warc {

  /** Write one `.warc` file per partition of `df(id, uri, payload)`;
    * payload may be STRING (UTF-8-encoded) or BINARY. Returns the file
    * paths. Existing part files in `dir` (including stale in-progress
    * temps from failed attempts) are removed first — re-layout must not
    * leave stale shards for the listing-driven reader.
    *
    * Task-retry / speculation safety: each attempt writes to an
    * attempt-unique temp name (`.part-$pid.warc.attempt-$id`) and
    * renames into place on success, so two attempts of the same
    * partition never interleave bytes in one file; the rename is
    * last-writer-wins on a byte-identical shard (same partition data),
    * never a torn record.
    *
    * Header values (id, uri) must not contain CR/LF/NUL — a '\n' inside
    * a URI would inject header lines (or terminate the block early) and
    * silently corrupt the record for every downstream reader, exactly
    * the hostile input a crawl pipeline sees. Rejected loudly here
    * rather than escaped: WARC has no header escaping convention, so an
    * escaped value would not round-trip either.
    */
  def write(df: DataFrame, dir: String): Seq[String] = {
    val spark = df.sparkSession
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dirPath))
      fs.listStatus(dirPath).filter(_.isFile)
        .filter(_.getPath.getName.contains("part-"))
        .foreach(st => fs.delete(st.getPath, false))
    fs.mkdirs(dirPath)
    val serConf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    df.select(col(df.columns(0)).cast("string").as("id"),
        col(df.columns(1)).cast("string").as("uri"),
        col(df.columns(2)).cast("binary").as("payload"))
      .rdd
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val shard = new Path(s"$dir/part-$pid.warc")
          val tmp = new Path(s"$dir/.part-$pid.warc.attempt-${tc.taskAttemptId()}")
          val shardFs = shard.getFileSystem(serConf.value)
          val out = shardFs.create(tmp, true)
          try {
            it.foreach { r =>
              val payload = r.getAs[Array[Byte]]("payload")
              val id = checkHeaderValue(r.getAs[String]("id"), "id")
              val uri = checkHeaderValue(r.getAs[String]("uri"), "uri")
              val head =
                s"WARC/1.0\r\n" +
                  s"WARC-Type: response\r\n" +
                  s"WARC-Record-ID: <urn:graft:$id>\r\n" +
                  s"WARC-Target-URI: $uri\r\n" +
                  s"Content-Length: ${payload.length}\r\n\r\n"
              out.write(head.getBytes(StandardCharsets.UTF_8))
              out.write(payload)
              out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
            }
            out.close()
            shardFs.delete(shard, false) // last-writer-wins vs a twin attempt
            if (!shardFs.rename(tmp, shard))
              throw new java.io.IOException(s"rename $tmp -> $shard failed")
          } catch {
            case e: Throwable =>
              try out.close() catch { case _: java.io.IOException => }
              shardFs.delete(tmp, false)
              throw e
          }
          Iterator.single(shard.toString)
        }
      }
      .collect().toSeq
  }

  /** Loud rejection of header-injection bytes (What's-wrong discipline:
    * fail, don't silently corrupt).
    */
  private def checkHeaderValue(v: String, what: String): String = {
    require(v != null, s"WARC $what header value is null")
    require(!v.exists(c => c == '\r' || c == '\n' || c == '\u0000'),
      s"WARC $what header value contains CR/LF/NUL (header injection): " +
        v.replace("\r", "\\r").replace("\n", "\\n").replace("\u0000", "\\0"))
    v
  }

  /** Read `.warc` files under a file/glob/dir path. Output:
    * (record_id, warc_type, target_uri, content_length, payload BINARY).
    */
  def read(
      spark: SparkSession,
      path: String,
      splitSize: Long = 128L * 1024 * 1024): DataFrame = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = listWarcs(fs, path)
    val splits: Seq[(String, Long, Long, Boolean)] = statuses.flatMap { st =>
      val p = st.getPath.toString
      val len = st.getLen
      if (p.endsWith(".gz")) Seq((p, 0L, Long.MaxValue, true))
      else (0L until math.max(len, 1L) by splitSize).map { off =>
        (p, off, math.min(off + splitSize, len), false)
      }
    }
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
            val seekTo = math.max(0L, start - 1)
            stream.seek(seekTo)
            splitRecords(stream, start, end, seekTo)
          }
        }
      }
    spark.createDataFrame(rdd)
      .toDF("record_id", "warc_type", "target_uri", "content_length", "payload")
  }

  private val HeaderRe = "^([A-Za-z][A-Za-z0-9-]*):\\s*(.*)$".r

  /** Emit records whose version line starts in [splitStart, splitEnd). */
  private[io] def splitRecords(
      in: InputStream,
      splitStart: Long,
      splitEnd: Long,
      streamPos: Long): Iterator[(String, String, String, Long, Array[Byte])] = {
    val r = new WarcByteReader(in, streamPos)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => r.close()))
    if (splitStart > 0) r.readLine() // discard the partial line

    // one-line pushback: when header validation fails ON a line that
    // could itself open a record (a payload ending in "WARC/1.0"
    // immediately before a real record), the scanner must re-examine
    // that exact line, not skip past it
    var pending: (Long, String) = null
    def nextLine(): (Long, String) =
      if (pending != null) { val l = pending; pending = null; l }
      else r.readLine()

    // (headers, payload) of the record whose version line was just read,
    // or null when the block fails validation (not a real record start)
    def parseAfterVersion(): (Map[String, String], Array[Byte]) = {
      val hdrs = scala.collection.mutable.Map.empty[String, String]
      var line = nextLine()
      while (line != null && line._2.nonEmpty) {
        line._2 match {
          case HeaderRe(k, v) => hdrs(k.toLowerCase) = v
          case _ =>
            pending = line // false sync — rescan from this very line
            return null
        }
        line = nextLine()
      }
      if (line == null) return null // EOF mid-headers
      hdrs.get("content-length").flatMap(_.toLongOption) match {
        case Some(n) if n >= 0 && n <= Int.MaxValue =>
          val payload = r.readFully(n.toInt)
          if (payload == null) null // truncated payload
          else {
            nextLine(); nextLine() // the CRLF CRLF record terminator
            (hdrs.toMap, payload)
          }
        case _ => null
      }
    }

    new Iterator[(String, String, String, Long, Array[Byte])] {
      private var nextRec: (String, String, String, Long, Array[Byte]) = _
      private var done = false

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          val line = nextLine()
          if (line == null) { done = true }
          else if (line._1 >= splitEnd) { done = true; r.close() }
          else if (line._2 == "WARC/1.0") {
            val parsed = parseAfterVersion()
            if (parsed != null) {
              val (h, payload) = parsed
              nextRec = (
                h.getOrElse("warc-record-id", ""),
                h.getOrElse("warc-type", ""),
                h.getOrElse("warc-target-uri", ""),
                payload.length.toLong,
                payload)
            }
            // a failed validation just resumes the line scan — the bytes
            // consumed belonged to a payload (or garbage), never to a
            // record this split owns
          }
        }
      }

      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): (String, String, String, Long, Array[Byte]) = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val out = nextRec
        nextRec = null
        out
      }
    }
  }

  private[io] def listWarcs(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[org.apache.hadoop.fs.FileStatus] =
    Option(fs.globStatus(new Path(path)))
      .getOrElse(Array.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile).toSeq
        else Seq(st)
      }
      .filter { st =>
        val n = st.getPath.getName
        (n.endsWith(".warc") || n.endsWith(".warc.gz")) && st.getLen > 0
      }
      .toSeq

  /** Byte reader tracking absolute offsets: CRLF/LF line reads for the
    * header region plus exact-length raw reads for payloads.
    */
  private final class WarcByteReader(in: InputStream, startPos: Long) {
    private var pos = startPos
    private val buf = new Array[Byte](64 * 1024)
    private var bufLen = 0
    private var bufPos = 0
    private var eof = false

    def close(): Unit = {
      if (!eof) { eof = true; try in.close() catch { case _: java.io.IOException => } }
    }

    /** (lineStartOffset, line sans CR/LF) or null at latched EOF.
      *
      * The line's bytes are accumulated RAW and decoded as UTF-8 at the
      * end — appending `b.toChar` on a signed Byte would sign-extend
      * every non-ASCII byte (0xE2 -> U+FFE2) and never assemble
      * multi-byte sequences, silently corrupting non-ASCII
      * WARC-Target-URI values that [[Warc.write]] emits as UTF-8.
      */
    def readLine(): (Long, String) = {
      if (eof) return null
      val start = pos
      var line = new Array[Byte](128)
      var lineLen = 0
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
          if (b == '\n') done = true
          else {
            if (lineLen == line.length)
              line = java.util.Arrays.copyOf(line, lineLen * 2)
            line(lineLen) = b
            lineLen += 1
          }
        }
      }
      if (!sawAny) null
      else {
        if (lineLen > 0 && line(lineLen - 1) == '\r') lineLen -= 1
        (start, new String(line, 0, lineLen, StandardCharsets.UTF_8))
      }
    }

    /** Exactly n raw bytes, or null if EOF interrupts. */
    def readFully(n: Int): Array[Byte] = {
      if (eof && n > 0) return null
      val out = new Array[Byte](n)
      var got = 0
      while (got < n) {
        if (bufPos == bufLen) {
          bufLen = in.read(buf)
          bufPos = 0
          if (bufLen <= 0) { eof = true; in.close(); return null }
        } else {
          val take = math.min(n - got, bufLen - bufPos)
          System.arraycopy(buf, bufPos, out, got, take)
          bufPos += take; got += take; pos += take
        }
      }
      out
    }
  }
}
