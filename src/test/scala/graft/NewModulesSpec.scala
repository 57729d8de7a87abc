package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SeqTable
import graft.gen.InSilica
import graft.ops.Multimodal
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hourlyCounts is batch/stream agnostic and matches the batch twin") {
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    val batch = EventStream.hourlyCounts(events)
      .orderBy("hour", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(batch.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 3.0)))
  }

  test("streaming micro-batches produce the same hourly aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.hourlyCounts(sdf)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hourly_test ORDER BY hour, event_type")
        .collect().map(r => (r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization groups by gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    // All three events in one batch: the in-batch gap scan closes session 1
    // when the 11:00 event arrives. AvailableNow (not processAllAvailable)
    // because the processing-time timeout otherwise keeps the engine
    // running maintenance micro-batches indefinitely.
    mem.addData(
      EventStream.Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      EventStream.Event(1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2.0),
      EventStream.Event(1L, Timestamp.valueOf("2024-01-01 11:00:00"), 4.0))
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "stream did not finish in time")
      val rows = spark.sql("SELECT * FROM sess_test").as[EventStream.SessionOut].collect()
      assert(rows.length == 1)
      assert(rows.head.n_events == 2 && rows.head.sum_value == 3.0)
    } finally q.stop()
  }

  test("streaming exact dedup drops in-watermark duplicates; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sdf = mem.toDF().toDF("ts", "text")
    val q = EventStream.dedupExactStream(sdf, "text")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "doc one"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "doc two"),
        (Timestamp.valueOf("2024-01-01 10:02:00"), "doc one")) // dup
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 10:30:00"), "doc one")) // still in watermark
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dedup_test").collect().map(_.getString(0))
      assert(texts.sorted.toSeq == Seq("doc one", "doc two"))
    } finally q.stop()
    // batch twin: same helper, plain dropDuplicates on the hash
    val batch = EventStream.dedupExactStream(
      Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "a")).toDF("ts", "text"), "text")
    assert(batch.count() == 1)
  }

  test("streaming simhash near-dup flags cross-batch near-identical docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SimDoc]
    val q = EventStream.simhashNearDupStream(mem.toDS())
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      mem.addData(EventStream.SimDoc(1L,
        "the quick brown fox jumps over the lazy dog again and again today"))
      q.processAllAvailable()
      mem.addData(
        EventStream.SimDoc(2L,
          "the quick brown fox jumps over the lazy dog again and again today"), // exact dup
        EventStream.SimDoc(3L, "completely different content with nothing shared at all"))
      q.processAllAvailable()
      val hits = spark.sql("SELECT DISTINCT doc_id, matches_doc_id FROM neardup_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits.contains((2L, 1L)), s"exact dup must be flagged, got $hits")
      assert(!hits.exists(h => h._1 == 3L || h._2 == 3L))
    } finally q.stop()
  }
}

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val media = Multimodal.asMedia(
    Seq((1L, "abcd"), (2L, ""), (3L, "zzzzzzzz")).toDF("id", "payload"),
    "id", "payload", "text/plain")

  test("media layout has the contract schema") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "mime", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("features computes byte stats per partition") {
    val f = Multimodal.features(media).orderBy("media_id").collect()
    // 'a'=97 'b'=98 'c'=99 'd'=100 → avg 98.5, all in hist bucket 6
    assert(f(0).getInt(2) == 4)
    assert(f(0).getDouble(3) == 98.5)
    assert(f(0).getSeq[Long](4)(6) == 4L)
    assert(f(1).getInt(2) == 0)
    assert(f(2).getInt(2) == 8 && f(2).getDouble(3) == 122.0)
  }

  test("frame sampling emits deterministic offsets and hashes") {
    val fr = Multimodal.sampleFrames(media.filter(col("media_id") === 3), nFrames = 4)
      .orderBy("frame_idx").collect()
    assert(fr.map(_.getInt(2)).toSeq == Seq(0, 2, 4, 6))
    // all-z payload → every frame window hashes identically except length effects
    assert(fr.map(_.getLong(3)).distinct.length >= 1)
    // empty payload yields no frames
    assert(Multimodal.sampleFrames(media.filter(col("media_id") === 2)).count() == 0)
  }

  test("resizeStub: exact nearest-neighbor index math on the 16-wide plane") {
    // 32 bytes = two source rows; 2x2 target samples (0,0),(0,8),(16),(24)
    val p = Array.tabulate(32)(i => (i + 10).toByte)
    assert(Multimodal.resizeStub(p, 2, 2).toSeq == Seq(10, 18, 26, 34))
    // ragged tail: 20 bytes -> srcH=2; position 24 is past n -> 0-padded
    val q = Array.tabulate(20)(i => (i + 1).toByte)
    assert(Multimodal.resizeStub(q, 2, 2).toSeq == Seq(1, 9, 17, 0))
    // upscale from one source row: rows repeat (sy always 0)
    val r = Array.tabulate(16)(i => i.toByte)
    val up = Multimodal.resizeStub(r, 4, 2)
    assert(up.toSeq == Seq(0, 4, 8, 12, 0, 4, 8, 12))
    // empty/null payloads resolve to all-zero planes
    assert(Multimodal.resizeStub(Array.emptyByteArray, 2, 2).toSeq ==
      Seq(0, 0, 0, 0))
    assert(Multimodal.resizeStub(null, 1, 1).toSeq == Seq(0))
  }

  test("resize DataFrame surface carries sums, corners and the pixel grid") {
    val out = Multimodal.resize(media, 2, 2, includePixels = true)
      .orderBy(col("media_id")).collect()
    // "abcd": n=4, srcH=1 -> samples (0,0),(0,8->pad),(same row again)
    assert(out(0).getLong(0) == 1L && out(0).getInt(1) == 2)
    assert(out(0).getSeq[Int](7) == Seq('a'.toInt, 0, 'a'.toInt, 0))
    assert(out(0).getLong(3) == 2L * 'a'.toInt)
    // empty payload: all zeros
    assert(out(1).getSeq[Int](7) == Seq(0, 0, 0, 0))
    // slim default: no pixels column, md5 of the CSV plane instead
    val slim = Multimodal.resize(media, 2, 2).orderBy(col("media_id")).collect()
    assert(!slim(0).schema.fieldNames.contains("pixels"))
    val csv = Seq('a'.toInt, 0, 'a'.toInt, 0).mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(csv.getBytes("US-ASCII")).map(b => f"${b & 0xFF}%02x").mkString
    assert(slim(0).getString(6) == hex)
  }

  test("dhash/ahash: bit-exact perceptual signatures over the stub plane") {
    // a strictly increasing plane: every adjacent comparison is <, so
    // dHash = all 64 bits set = -1L
    val inc = Array.tabulate(9 * 8 * 16)(i => (i % 127).toByte)
    // build a payload whose 9x8 resample is strictly increasing per row:
    // 16-wide plane rows of ramp values
    val ramp = Array.tabulate(16 * 8)(i => ((i % 16) * 8 + i / 16).toByte)
    val px9 = Multimodal.resizeStub(ramp, 9, 8)
    var expect = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (px9(r * 9 + c) < px9(r * 9 + c + 1)) expect |= 1L << (r * 8 + c)
    assert(Multimodal.dhashStub(ramp) == expect)
    // constant plane: no < anywhere -> dhash 0; ahash all bits (px*64 >= sum)
    val const = Array.fill(64)(7.toByte)
    assert(Multimodal.dhashStub(const) == 0L)
    // ahash: bits set where px*64 >= sum. all-equal 8x8 plane -> all set
    val full16 = Array.fill(16 * 8)(9.toByte)
    assert(Multimodal.ahashStub(full16) == -1L)
    // null/empty payloads: all-zero plane -> dhash 0, ahash all bits (0*64>=0)
    assert(Multimodal.dhashStub(null) == 0L)
    assert(Multimodal.ahashStub(null) == -1L)
  }

  test("dhash is invariant to brightness shift and contrast scaling") {
    // gradient DIRECTION survives the monotone per-pixel maps a
    // re-encode applies — the property that makes dHash the right
    // third leg where byte hashing fails
    val base = Array.tabulate(16 * 8)(i => ((i * 7) % 101 + 20).toByte)
    val brighter = base.map(b => ((b & 0xFF) + 40).min(255).toByte)
    // contrast: scale distances from the plane's own mid-value by 5/4 —
    // chosen so no pixel clamps (clamping would merge distinct values
    // and legitimately flip strict comparisons)
    val contrast = base.map { b =>
      val v = 70 + ((b & 0xFF) - 70) * 5 / 4
      v.max(0).min(255).toByte
    }
    val d0 = Multimodal.dhashStub(base)
    assert(Multimodal.dhashStub(brighter) == d0,
      "uniform brightness shift must not change gradient direction")
    assert(Multimodal.dhashStub(contrast) == d0,
      "monotone contrast scaling must not change gradient direction")
    // but an actual content change does
    val edited = base.clone(); edited(17) = (edited(17) + 90).toByte
    assert(Multimodal.dhashStub(edited) != d0)
  }

  test("dctHash: invariances and the crop-tolerance step up over dHash") {
    // pseudo-random per-pixel texture over a smooth gradient — the
    // image shape where the two hashes genuinely differ: dHash reads
    // local gradients (texture-dominated), the DCT hash reads the 8×8
    // low-frequency block (gradient-dominated)
    def tex(x: Int, y: Int): Int = {
      var h = (x * 2654435761L) ^ (y * 2246822519L) ^ ((x * y + 7) * 40503L)
      h ^= (h >>> 13); h *= 0x9E3779B97F4A7C15L; h ^= (h >>> 29)
      (h % 21).toInt.abs - 10
    }
    def plane(h: Int): Array[Byte] = {
      val out = new Array[Byte](16 * h)
      for (y <- 0 until h; x <- 0 until 16) {
        val low = 110 + (60 * y) / h + (30 * x) / 16
        out(y * 16 + x) = math.max(0, math.min(245, low + tex(x, y))).toByte
      }
      out
    }
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val orig = plane(32)
    val dct0 = Multimodal.dctHashStub(orig)
    val dh0 = Multimodal.dhashStub(orig)
    // DC bit is never set — brightness lives there alone
    assert((dct0 & 1L) == 0L)
    // uniform brightness shift: EXACTLY invariant (the shift moves only
    // the excluded DC coefficient up to the table's sub-pixel floor
    // error, far below any AC coefficient's distance from the median)
    val bright = orig.map(b => ((b & 0xFF) + 10).toByte)
    assert(hd(dct0, Multimodal.dctHashStub(bright)) == 0)
    // crop tolerance — THE robustness step dHash lacks. One plane row
    // cropped: the DCT hash stays inside the banded radius (≤ 3, still
    // caught by dctNearDuplicates) while dHash already leaves it; two
    // rows cropped: dHash scatters ~20 bits, the DCT hash a third of
    // that (measured 2/4 and 6/19 on this fixture — pinned with slack).
    val crop1 = orig.drop(16)
    val dctC1 = hd(dct0, Multimodal.dctHashStub(crop1))
    val dhC1 = hd(dh0, Multimodal.dhashStub(crop1))
    assert(dctC1 <= 3, s"1-row crop moved the DCT hash $dctC1 bits — outside the band")
    assert(dhC1 > 3, s"premise: dHash should leave the radius-3 band, moved $dhC1")
    val crop2 = orig.drop(32)
    val dctC2 = hd(dct0, Multimodal.dctHashStub(crop2))
    val dhC2 = hd(dh0, Multimodal.dhashStub(crop2))
    assert(dctC2 <= 8 && dhC2 >= 12 && 2 * dctC2 < dhC2,
      s"2-row crop: dct=$dctC2 dhash=$dhC2 — crop tolerance inverted")
    // inversion is content change, not noise: the hash must separate it
    assert(hd(dct0, Multimodal.dctHashStub(orig.map(b => (255 - (b & 0xFF)).toByte))) > 32)
    // degenerate payloads: all-zero plane → all coefficients 0, median
    // 0, no strict exceedance → signature 0, never a throw
    assert(Multimodal.dctHashStub(null) == 0L)
    assert(Multimodal.dctHashStub(Array.empty[Byte]) == 0L)
  }

  test("dctNearDuplicates: banded pairs equal exact hamming truth") {
    import spark.implicits._
    // the textured plane from the invariance test: its 1-row crop is a
    // genuine near-duplicate in DCT space (hamming ≤ 3) that dHash
    // already misses — exactly the pair this detector exists for
    def tex(x: Int, y: Int): Int = {
      var h = (x * 2654435761L) ^ (y * 2246822519L) ^ ((x * y + 7) * 40503L)
      h ^= (h >>> 13); h *= 0x9E3779B97F4A7C15L; h ^= (h >>> 29)
      (h % 21).toInt.abs - 10
    }
    val base = Array.tabulate(16 * 32) { i =>
      val x = i % 16; val y = i / 16
      val low = 110 + (60 * y) / 32 + (30 * x) / 16
      math.max(0, math.min(245, low + tex(x, y))).toByte
    }
    val near = base.drop(16) // 1-row crop
    val far = base.map(b => (255 - (b & 0xFF)).toByte)
    val rows = Seq((1L, base), (2L, near), (3L, far))
    val df = rows.toDF("media_id", "payload")
    val pairs = Multimodal.dctNearDuplicates(df, maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
    val sigs = rows.map { case (id, p) => id -> Multimodal.dctHashStub(p) }.toMap
    val truth = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).sorted
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq == truth)
    assert(truth.nonEmpty, "premise: the 1-byte perturbation must stay near in DCT space")
  }

  test("phashNearDuplicates: banded pairs equal exact hamming truth") {
    import spark.implicits._
    // payloads: base plane, a 1-byte perturbation (small hamming), and a
    // very different plane
    val base = Array.tabulate(16 * 8)(i => ((i * 7) % 101).toByte)
    val near = base.clone(); near(17) = (near(17) + 90).toByte
    val far = Array.tabulate(16 * 8)(i => ((i * 13 + 5) % 251).toByte)
    val rows = Seq((1L, base), (2L, near), (3L, far))
    val df = rows.toDF("media_id", "payload")
    val pairs = Multimodal.phashNearDuplicates(df, maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
    // exact truth
    val sigs = rows.map { case (id, p) => id -> Multimodal.dhashStub(p) }.toMap
    val truth = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).sorted
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq == truth)
    assert(truth.nonEmpty) // the near pair must actually be near
  }
}

class InSilicaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("generateSequence deterministic per seed") {
    val s1 = InSilica.generateSequence(50, seed = 1)
    assert(s1 == InSilica.generateSequence(50, seed = 1))
    assert(s1 != InSilica.generateSequence(50, seed = 2))
    assert(s1.forall("ACGT".contains(_)))
  }

  test("generateLibrary mutates at roughly the requested rate") {
    val scaffold = InSilica.generateSequence(100, seed = 3)
    val lib = InSilica.generateLibrary(spark, scaffold, 200, errorRate = 0.1)
    val rows = lib.collect()
    assert(rows.length == 200)
    val dists = rows.map(_.getString(1).zip(scaffold).count(p => p._1 != p._2))
    val meanErr = dists.sum.toDouble / (200 * 100)
    assert(meanErr > 0.05 && meanErr < 0.15, s"mean error rate $meanErr")
    // mutations never produce the original letter
    assert(rows.forall(_.getString(1).length == 100))
  }

  test("addQualityScores produces valid phred range and declining means") {
    val scaffold = InSilica.generateSequence(80, seed = 5)
    val lib = InSilica.generateLibrary(spark, scaffold, 100, 0.0)
    val withQ = InSilica.addQualityScores(lib, startMean = 35, endMean = 20)
    val quals = withQ.collect().map(_.getString(2))
    assert(quals.forall(_.length == 80))
    val asNum = quals.map(_.map(_.toInt - 33))
    assert(asNum.flatten.forall(q => q >= 2 && q <= 40))
    val firstMean = asNum.map(_.head).sum.toDouble / 100
    val lastMean = asNum.map(_.last).sum.toDouble / 100
    assert(firstMean > lastMean + 5)
  }

  test("viewWithInsertions unions dense and insertion cells") {
    import spark.implicits._
    val st0 = SeqTable.fromReads(spark, Seq(("r1", "AC", "II"), ("r2", "GT", "55")))
    val ins = Seq(("r1", 2, -1, "T", 30)).toDF("read_id", "position", "loc", "base", "qual")
    val st = st0.copy(insertions = ins)
    val v = st.viewWithInsertions()
      .orderBy("read_id", "position", "loc").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(v.toSeq == Seq(
      ("r1", 1, 0, "A"), ("r1", 2, -1, "T"), ("r1", 2, 0, "C"),
      ("r2", 1, 0, "G"), ("r2", 2, 0, "T")))
    val wide = st.viewWithInsertionsWide()
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(wide("r1") == "ATC")
    assert(wide("r2") == "G-T")
  }
}

class FastqChunkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("fastqChunks yields one SeqTable per arriving file") {
    val dir = java.nio.file.Files.createTempDirectory("fqstream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("fqckpt").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.fq").toPath,
      "@r1\nACGT\n+\nIIII\n@r2\nTTTT\n+\n5555\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "b.fq").toPath,
      "@r3\nGGGGGG\n+\nIIIIII\n")
    val chunks = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val q = EventStream.fastqChunks(spark, dir.getAbsolutePath, ckpt.getAbsolutePath) { st =>
      chunks.add((st.reads.count(), st.maxPos - st.minPos + 1))
    }
    try {
      q.processAllAvailable()
      val got = chunks.toArray(Array.empty[(Long, Int)]).toSet
      assert(got == Set((2L, 4), (1L, 6)))
    } finally q.stop()
  }
}
