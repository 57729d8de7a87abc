package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque BINARY columns next to typed metadata — the
  * standard lakehouse layout for a 100 TB training-data pipeline: parquet
  * stores the bytes inline (small assets) or a URI (large assets), Spark
  * prunes/filters on the metadata without touching payloads, and decode
  * happens executor-side in batched partitions.
  *
  * The decode step itself is STUBBED deterministically — no image/audio
  * codecs exist in this environment — but the Spark-side contract (schema,
  * partition-batched execution, feature shapes) is real and tested; a
  * production build swaps `decodeStub` for a JNI/FFmpeg/ImageIO call
  * without touching any plan shape.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Wrap a text/binary source into the media layout (mime from caller). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"),
      map(lit("origin"), lit(payloadCol)).as("meta"))

  /** Deterministic stand-in for a real decoder: byte-level statistics that
    * a real image decode would replace with pixel features. Runs per
    * partition over primitive arrays — the exact execution shape a real
    * decoder needs (batch the codec init per partition, not per row).
    */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Double, Array[Long]) = {
    if (payload == null || payload.isEmpty) return (0, 0.0, new Array[Long](16))
    var sum = 0L
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      sum += b
      hist(b >>> 4) += 1
      i += 1
    }
    (payload.length, sum.toDouble / payload.length, hist)
  }

  /** Feature extraction over the media frame:
    * (media_id, mime, n_bytes, avg_byte, hist16 ARRAY<BIGINT>).
    * mapPartitions so a real decoder initializes once per partition.
    */
  def features(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mime", StringType),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("avg_byte", DoubleType, nullable = false),
      StructField("hist16", ArrayType(LongType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select("media_id", "mime", "payload")
      .mapPartitions { it =>
        // per-partition init happens HERE in a real decoder
        it.map { r =>
          val (n, avg, hist) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), r.getString(1), n, avg, hist.toSeq)
        }
      }(enc)
  }

  /** Exact media dedup by content hash — the first dedup every image/
    * audio corpus runs (identical bytes re-crawled under different ids/
    * URLs). Needs NO codec, so unlike the decode path this is fully
    * real: one aggregate keyed on md5(payload) (hex, the industry
    * convention for content-addressed stores; swap xxhash64 in when the
    * shuffle key matters more than external reproducibility). Output:
    * one row per distinct payload with the keeper (min media_id), copy
    * count, and byte sizes.
    */
  def exactDuplicates(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("content_md5"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        max(length(col("payload"))).as("n_bytes"))
      .select(col("content_md5"), col("keeper_id"), col("n_copies"),
        col("n_bytes"),
        ((col("n_copies") - 1) * col("n_bytes")).as("bytes_saved"))

  /** Frame-sampling stub for video-shaped payloads: deterministic byte
    * offsets standing in for timestamps; output one row per sampled frame
    * (media_id, frame_idx, offset, frame_hash).
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("offset", IntegerType, nullable = false),
      StructField("frame_hash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select("media_id", "payload")
      .flatMap { r =>
        val p = r.getAs[Array[Byte]]("payload")
        if (p == null || p.isEmpty) Iterator.empty
        else (0 until nFrames).iterator.map { f =>
          val off = (p.length.toLong * f / nFrames).toInt
          // FNV over the "frame" window as the stub frame content hash
          var h = 0xcbf29ce484222325L
          var i = off
          val end = math.min(p.length, off + 64)
          while (i < end) { h ^= (p(i) & 0xFFL); h *= 0x100000001b3L; i += 1 }
          Row(r.getLong(0), f, off, h)
        }
      }(enc)
  }
}
