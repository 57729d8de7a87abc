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

  /** Resize over the stub-decoded plane: payloads are interpreted as a
    * raw 8-bit grayscale plane of fixed width [[StubPlaneWidth]] (the
    * honest stand-in for a pixel decode — no codecs in this sandbox),
    * then NEAREST-NEIGHBOR resampled to (outW, outH) with pure integer
    * index math `src = (dst * srcDim) / outDim` — so unlike the decode
    * itself, the resample arithmetic is fully real, deterministic and
    * oracle-checkable byte for byte. Same mapPartitions batch shape as
    * [[features]]: a real image decoder slots into the partition loop
    * without touching the plan. Output: (media_id, out_w, out_h,
    * px_sum, px_first, px_last, px_md5) — px_md5 is the md5 hex of the
    * comma-joined pixel CSV, so the full plane stays hash-verifiable
    * while the contract row stays a few dozen bytes. Pass
    * includePixels=true to also carry the full `pixels` ARRAY<INT>
    * (row-major) — opt-in, because at corpus scale that column is
    * W×H×4 bytes per record.
    */
  val StubPlaneWidth = 16

  private[graft] def resizeStub(payload: Array[Byte], outW: Int,
                                outH: Int): Array[Int] = {
    val n = if (payload == null) 0 else payload.length
    val srcW = StubPlaneWidth
    val srcH = math.max(1, (n + srcW - 1) / srcW)
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * srcH / outH
      var x = 0
      while (x < outW) {
        val sx = x * srcW / outW
        val pos = sy * srcW + sx
        out(y * outW + x) = if (pos < n) payload(pos) & 0xFF else 0
        x += 1
      }
      y += 1
    }
    out
  }

  def resize(media: DataFrame, outW: Int, outH: Int,
             includePixels: Boolean = false): DataFrame = {
    require(outW >= 1 && outH >= 1)
    val slim = Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_first", IntegerType, nullable = false),
      StructField("px_last", IntegerType, nullable = false),
      StructField("px_md5", StringType, nullable = false))
    val out = StructType(
      if (includePixels) slim :+ StructField("pixels", ArrayType(IntegerType), nullable = false)
      else slim)
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select("media_id", "payload")
      .mapPartitions { it =>
        // per-partition init point for a real decoder/resampler
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val px = resizeStub(r.getAs[Array[Byte]]("payload"), outW, outH)
          md.reset()
          val dig = md.digest(px.mkString(",")
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          val hex = dig.map(b => f"${b & 0xFF}%02x").mkString
          val base = Seq[Any](r.getLong(0), outW, outH, px.map(_.toLong).sum,
            px.head, px.last, hex)
          Row.fromSeq(if (includePixels) base :+ px.toSeq else base)
        }
      }(enc)
  }

  /** 64-bit difference hash (dHash) over the stub-decoded plane — the
    * industry-standard perceptual signature for re-encoded/resized image
    * duplicates that byte hashing misses: resample to 9×8 (nearest
    * neighbor, [[resizeStub]] — fully real integer arithmetic), then bit
    * r*8+c is set iff plane(r,c) < plane(r,c+1). Gradient direction
    * survives brightness/contrast shifts and re-encoding noise; only the
    * DECODE below the plane is stubbed (no codecs in this sandbox).
    */
  private[graft] def dhashStub(payload: Array[Byte]): Long = {
    val px = resizeStub(payload, 9, 8)
    var sig = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (px(r * 9 + c) < px(r * 9 + c + 1)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** 64-bit average hash (aHash): resample to 8×8, bit i set iff pixel i
    * is >= the plane mean. The comparison is kept in exact integers
    * (px*64 >= sum ⟺ px >= mean) so the signature is bit-reproducible
    * across engines with no float rounding anywhere.
    */
  private[graft] def ahashStub(payload: Array[Byte]): Long = {
    val px = resizeStub(payload, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += px(i); i += 1 }
    var sig = 0L
    i = 0
    while (i < 64) {
      if (px(i).toLong * 64 >= sum) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Fixed-point cosine basis for the 32-point DCT-II, first 8
    * frequency rows only (the low-frequency block is all pHash reads):
    * entry u*32+n = floor(cos(π(2n+1)u/64) · 2^14) — the same
    * floor(x·2^B) quantization discipline as [[Pca]], so the DuckDB
    * oracle restates the hash over the SAME integer table (interpolated
    * as literals; a constant, like a codon table) with zero float
    * drift anywhere.
    */
  private[graft] val DctCosTable: Array[Long] = {
    val t = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var n = 0
      while (n < 32) {
        t(u * 32 + n) =
          math.floor(math.cos(math.Pi * (2 * n + 1) * u / 64.0) * (1L << 14)).toLong
        n += 1
      }
      u += 1
    }
    t
  }

  /** 64-bit DCT perceptual hash (classic pHash) — the robustness step
    * up from dHash/aHash: signatures live in the 8×8 LOW-FREQUENCY
    * corner of a 32×32 DCT, so re-encode noise, small crops and small
    * shifts (which scramble dHash's local gradients) barely move them.
    * Pipeline: [[resizeStub]] to 32×32 (real integer resample; only
    * the codec decode below it is stubbed), two-stage integer DCT with
    * [[DctCosTable]] (stage 1 over rows, stage 2 over columns — exact
    * Long arithmetic, max |coeff| < 2^47, no rounding anywhere), then
    * bit i∈[1,64) is set iff coefficient i exceeds the LOWER MEDIAN of
    * the 63 non-DC coefficients (bit 0, the DC term, is always 0 — it
    * carries only brightness). Every step is integer-exact, so
    * q_media_dct replays the full transform bit for bit in DuckDB.
    */
  private[graft] def dctHashStub(payload: Array[Byte]): Long = {
    val px = resizeStub(payload, 32, 32)
    val ct = DctCosTable
    // stage 1: M(u, x) = Σ_y C(u,y) · px(y,x)  — 8×32 intermediate
    val m = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        var acc = 0L
        var y = 0
        while (y < 32) { acc += ct(u * 32 + y) * px(y * 32 + x); y += 1 }
        m(u * 32 + x) = acc
        x += 1
      }
      u += 1
    }
    // stage 2: F(u, v) = Σ_x C(v,x) · M(u,x)  — the 8×8 block
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var x = 0
        while (x < 32) { acc += ct(v * 32 + x) * m(u * 32 + x); x += 1 }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val nonDc = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(nonDc)
    val med = nonDc(31) // lower median of the 63 AC coefficients
    var sig = 0L
    var i = 1
    while (i < 64) {
      if (f(i) > med) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** DCT signature per media row: (media_id, dcthash). Same map-only
    * UDF shape (and asNondeterministic inlining pin) as
    * [[perceptualHashes]].
    */
  def dctHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((b: Array[Byte]) => dctHashStub(b)).asNondeterministic()
    media.select(col(idCol), u(col(payloadCol)).as("dcthash"))
  }

  /** DCT near-duplicate pairs through the same radius-general banding
    * as dHash/SimHash ([[graft.ops.Dedup.hammingNearDuplicates64]]) —
    * guaranteed recall at any maxHamming, never all-pairs.
    */
  def dctNearDuplicates(media: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val u = udf((b: Array[Byte]) => dctHashStub(b)).asNondeterministic()
    Dedup.hammingNearDuplicates64(
      media.select(col(idCol).as("id"), u(col(payloadCol)).as("sig")),
      maxHamming)
  }

  /** Perceptual signatures per media row: (media_id, dhash, ahash).
    * Map-only, rides the scan; a per-row byte walk no builtin expresses,
    * so a typed UDF with the repo-standard asNondeterministic inlining
    * pin (the kernel is pure — the pin stops CollapseProject from
    * re-running the resample once per consumer column).
    */
  def perceptualHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((b: Array[Byte]) => (dhashStub(b), ahashStub(b)))
      .asNondeterministic()
    media.select(col(idCol), u(col(payloadCol)).as("h"))
      .select(col(idCol), col("h._1").as("dhash"), col("h._2").as("ahash"))
  }

  /** Perceptual near-duplicate pairs: dHash signatures + the
    * maxHamming+1 chunk blocking shared with SimHash
    * ([[graft.ops.Dedup.hammingNearDuplicates64]] — pigeonhole GUARANTEE
    * at any radius: maxHamming differing bits cannot dirty all
    * maxHamming+1 chunks, so recall vs exact Hamming truth is exactly
    * 1.0, not probabilistic; the default 3 is the classic 4×16 split).
    * Output: (id_a, id_b, hamming_bits).
    * Scale shape: banded self-join on (chunk, chunk_val) — never all
    * pairs; at 100 TB the bucket join is the same geometry the SimHash
    * text path already runs.
    */
  def phashNearDuplicates(media: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val dh = udf((b: Array[Byte]) => dhashStub(b)).asNondeterministic()
    Dedup.hammingNearDuplicates64(
      media.select(col(idCol).as("id"), dh(col(payloadCol)).as("sig")),
      maxHamming)
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

  /** Sniffed container metadata: what a 100 TB media pipeline filters on
    * BEFORE any decode (drop icons by dims, route audio by sample rate,
    * partition by format). `format` is always set ("unknown" when no
    * magic matches); the typed fields are null where the container does
    * not carry them or the header is truncated.
    */
  case class MediaInfo(
      format: String,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      channels: Option[Int],
      bits_per_sample: Option[Int])

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
      ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
  private def ascii(p: Array[Byte], i: Int, n: Int): String =
    new String(p, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  private val unknown = MediaInfo("unknown", None, None, None, None, None)

  /** Header-only format + metadata sniffing over raw payload bytes —
    * codec-free, so (unlike the pixel/waveform decode stub) this path is
    * fully real. Formats and the fields each spec puts in its header:
    *
    *  - PNG (RFC 2083 / W3C): 8-byte signature, then the IHDR chunk must
    *    come first — width/height big-endian u32 at offsets 16/20. CRCs
    *    are NOT validated (sniffing, not verification).
    *  - JPEG (ITU T.81): FF D8 SOI, then a marker walk — 0xFF fill bytes
    *    skipped, standalone markers (TEM, RSTn) have no length, every
    *    other segment carries a big-endian self-inclusive length. Dims
    *    come from the first frame header SOFn (C0–CF excluding C4 DHT,
    *    C8 JPG, CC DAC): precision u8, height u16, width u16. The walk
    *    stops at SOS/EOI or truncation → format "jpeg", null dims.
    *  - GIF (87a/89a): logical-screen width/height little-endian u16 at 6/8.
    *  - BMP (BITMAPINFOHEADER): "BM", signed little-endian dims at 18/22;
    *    negative height means top-down row order → abs().
    *  - WAV (RIFF): chunk walk from offset 12 honoring the RIFF even-byte
    *    padding rule until "fmt " — channels u16, sample rate u32,
    *    bits-per-sample u16, all little-endian.
    *
    * Total on garbage: any malformed/truncated/null input degrades to
    * "unknown" or detected-format-with-null-fields, never throws.
    */
  def sniff(p: Array[Byte]): MediaInfo = {
    if (p == null || p.length < 2) return unknown
    val n = p.length
    // PNG
    if (n >= 8 && (p(0) & 0xFF) == 0x89 && ascii(p, 1, 3) == "PNG" &&
        p(4) == 0x0D && p(5) == 0x0A && p(6) == 0x1A && p(7) == 0x0A) {
      return if (n >= 24 && ascii(p, 12, 4) == "IHDR")
        MediaInfo("png", Some(be32(p, 16).toInt), Some(be32(p, 20).toInt),
          None, None, None)
      else MediaInfo("png", None, None, None, None, None)
    }
    // GIF
    if (n >= 6 && (ascii(p, 0, 6) == "GIF87a" || ascii(p, 0, 6) == "GIF89a")) {
      return if (n >= 10)
        MediaInfo("gif", Some(le16(p, 6)), Some(le16(p, 8)), None, None, None)
      else MediaInfo("gif", None, None, None, None, None)
    }
    // JPEG
    if ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i < n) {
        var j = i
        while (j < n && (p(j) & 0xFF) == 0xFF) j += 1 // fill bytes
        if (j >= n || j == i) // no 0xFF where a marker must start
          return MediaInfo("jpeg", None, None, None, None, None)
        val m = p(j) & 0xFF
        if (m == 0x01 || m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) i = j + 1 // standalone (TEM, stray SOI, RSTn)
        else if (m == 0xD9 || m == 0xDA) // EOI / SOS: no SOF seen
          return MediaInfo("jpeg", None, None, None, None, None)
        else {
          if (j + 2 >= n) return MediaInfo("jpeg", None, None, None, None, None)
          val segLen = be16(p, j + 1)
          if (segLen < 2) return MediaInfo("jpeg", None, None, None, None, None)
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            return if (j + 7 < n)
              MediaInfo("jpeg", Some(be16(p, j + 6)), Some(be16(p, j + 4)),
                None, None, None)
            else MediaInfo("jpeg", None, None, None, None, None)
          }
          i = j + 1 + segLen
        }
      }
      return MediaInfo("jpeg", None, None, None, None, None)
    }
    // WAV (check RIFF before BMP: both are printable-ASCII magics)
    if (n >= 12 && ascii(p, 0, 4) == "RIFF" && ascii(p, 8, 4) == "WAVE") {
      var i = 12
      while (i + 8 <= n) {
        val id = ascii(p, i, 4)
        val size = le32(p, i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= n) {
          return MediaInfo("wav", None, None,
            Some(le32(p, i + 12).toInt), Some(le16(p, i + 10)),
            Some(le16(p, i + 22)))
        }
        if (size < 0 || size > Int.MaxValue - 9) return MediaInfo("wav", None, None, None, None, None)
        i += 8 + size.toInt + (size.toInt & 1) // RIFF pads chunks to even
      }
      return MediaInfo("wav", None, None, None, None, None)
    }
    // BMP
    if (ascii(p, 0, 2) == "BM") {
      return if (n >= 26)
        MediaInfo("bmp", Some(math.abs(le32(p, 18).toInt)),
          Some(math.abs(le32(p, 22).toInt)), None, None, None)
      else MediaInfo("bmp", None, None, None, None, None)
    }
    unknown
  }

  /** `sniff` lifted over a media frame: (id, format, width, height,
    * sample_rate, channels, bits_per_sample). A per-row byte walk with no
    * built-in-function equivalent, so a typed UDF is the right tool;
    * map-only, rides the scan, never shuffles. asNondeterministic is the
    * repo-standard PERFORMANCE pin (the kernel is pure): six columns
    * project out of one struct result, and CollapseProject inlines
    * deterministic expressions per reference — without the pin the byte
    * walk runs once per consumer instead of once per row.
    */
  def sniffMedia(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((b: Array[Byte]) => sniff(b)).asNondeterministic()
    media.select(col(idCol), u(col(payloadCol)).as("s"))
      .select(col(idCol), col("s.format").as("format"),
        col("s.width").as("width"), col("s.height").as("height"),
        col("s.sample_rate").as("sample_rate"),
        col("s.channels").as("channels"),
        col("s.bits_per_sample").as("bits_per_sample"))
  }

  /** Corpus-gate encoder twin of `sniff` (the `Http.encodeResponse`
    * discipline): builds a REAL container header — valid per the specs
    * cited on `sniff` — whose metadata is pure `id` arithmetic, so a
    * DuckDB oracle can restate the expected sniff output byte-free while
    * the Spark side round-trips through genuine header bytes. Branch by
    * id%6: png / jpeg (APP0 + variable-length COM before SOF0, making
    * the marker walk load-bearing) / gif / wav (odd-sized LIST chunk
    * before fmt on odd id/6, making the even-padding rule load-bearing) /
    * bmp (top-down negative height on id%12==10, making abs() load-
    * bearing) / raw text (no magic → "unknown").
    */
  def syntheticMediaPayload(id: Long, text: String): Array[Byte] = {
    val bb = new scala.collection.mutable.ArrayBuffer[Byte](64)
    def u8(v: Int): Unit = bb += (v & 0xFF).toByte
    def sBE16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def sBE32(v: Long): Unit = { u8((v >>> 24).toInt); u8((v >>> 16).toInt); u8((v >>> 8).toInt); u8(v.toInt) }
    def sLE16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def sLE32(v: Long): Unit = { u8(v.toInt); u8((v >>> 8).toInt); u8((v >>> 16).toInt); u8((v >>> 24).toInt) }
    def str(s: String): Unit = bb ++= s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val w = (16 + id % 1017).toInt
    val h = (16 + (id * 7) % 767).toInt
    (id % 6) match {
      case 0 => // PNG: signature + IHDR (CRC bytes zeroed — sniff ignores)
        bb ++= Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
        sBE32(13); str("IHDR"); sBE32(w); sBE32(h)
        u8(8); u8(6); u8(0); u8(0); u8(0); sBE32(0)
      case 1 => // JPEG: SOI, APP0/JFIF, variable COM, SOF0, EOI
        u8(0xFF); u8(0xD8)
        u8(0xFF); u8(0xE0); sBE16(16); str("JFIF"); u8(0)
        u8(1); u8(1); u8(0); sBE16(1); sBE16(1); u8(0); u8(0)
        val comLen = 3 + (id % 13).toInt
        u8(0xFF); u8(0xFE); sBE16(comLen)
        var c = 0; while (c < comLen - 2) { u8('x'); c += 1 }
        u8(0xFF); u8(0xC0); sBE16(17); u8(8); sBE16(h); sBE16(w); u8(3)
        u8(1); u8(0x22); u8(0); u8(2); u8(0x11); u8(1); u8(3); u8(0x11); u8(1)
        u8(0xFF); u8(0xD9)
      case 2 => // GIF89a logical screen descriptor + trailer
        str("GIF89a"); sLE16(w); sLE16(h); u8(0); u8(0); u8(0); u8(';')
      case 3 => // WAV: RIFF/WAVE, optional odd LIST chunk, fmt , empty data
        val k = id / 6
        val rate = Array(8000, 16000, 22050, 44100)((k % 4).toInt)
        val ch = 1 + (k % 2).toInt
        val bits = 8 + 8 * ((k % 3).toInt)
        str("RIFF"); sLE32(0); str("WAVE") // size backpatched below
        if (k % 2 == 1) { str("LIST"); sLE32(3); str("abc"); u8(0) } // odd → pad
        str("fmt "); sLE32(16)
        sLE16(1); sLE16(ch); sLE32(rate)
        sLE32(rate.toLong * ch * bits / 8); sLE16(ch * bits / 8); sLE16(bits)
        str("data"); sLE32(0)
        val riffSize = bb.length - 8
        bb(4) = riffSize.toByte; bb(5) = (riffSize >>> 8).toByte
        bb(6) = (riffSize >>> 16).toByte; bb(7) = (riffSize >>> 24).toByte
      case 4 => // BMP: BITMAPINFOHEADER; id%12==10 → stored top-down (-h)
        val storedH = if (id % 12 == 10) -h else h
        str("BM"); sLE32(54); sLE16(0); sLE16(0); sLE32(54)
        sLE32(40); sLE32(w); sLE32(storedH.toLong & 0xFFFFFFFFL)
        sLE16(1); sLE16(24); sLE32(0); sLE32(0)
      case _ => // no magic: raw text bytes behind a non-magic prefix
        str("RAW:")
        bb ++= Option(text).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    bb.toArray
  }

  /** Column form of the encoder for corpus-gate queries. */
  def syntheticMediaPayloadUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, text: String) => syntheticMediaPayload(id, text))
}
