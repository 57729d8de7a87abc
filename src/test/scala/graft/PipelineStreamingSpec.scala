package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, Classifier, Dsir, Sampling}

/** The stateless pipeline operators (hash split, token chunking) are pure
  * per-row expressions, so the SAME code must run unchanged on a
  * Structured Streaming frame and agree with its batch twin — the
  * property that lets an ingest firehose be split/chunked on the fly
  * while the nightly batch job reproduces it bit-for-bit.
  */
class PipelineStreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "zeta eta"),
    (3L, "theta iota kappa LAMBDA mu nu xi")
  )

  test("hashSplit on a stream matches the batch assignment") {
    implicit val sqlCtx = spark.sqlContext
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val batch = Sampling.hashSplit(docs.toDF("doc_id", "text"), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap

    val mem = MemoryStream[(Long, String)]
    val q = Sampling.hashSplit(mem.toDF().toDF("doc_id", "text"), "doc_id", splits)
      .writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, split FROM split_stream")
        .as[(Long, String)].collect().toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("URL normalization and CDC chunking on a stream match their batch twins") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "HTTP://WWW.Ex.COM:80/A/b?utm_source=x&b=2&a=1#f", "alpha beta " * 40),
      (2L, "https://a.co.uk:8443/p?z=1&gclid=9", "gamma delta " * 25),
      (3L, "http://plain.de", "epsilon"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("id"),
        graft.ops.UrlOps.normalize(col("_2")).as("u"),
        graft.ops.UrlOps.registrableDomain(graft.ops.UrlOps.host(col("_2"))).as("d"),
        graft.ops.Cdc.chunks(col("_3")).as("ch"))
    val batch = shape(rows.toDF())
      .as[(Long, String, String, Seq[String])].collect().toSet
    val mem = MemoryStream[(Long, String, String)]
    val q = shape(mem.toDF())
      .writeStream.format("memory").queryName("web_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(1): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(1): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT id, u, d, ch FROM web_stream")
        .as[(Long, String, String, Seq[String])].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming URL dedup drops differently-written equivalent URLs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // three spellings of ONE canonical URL + one genuinely distinct URL
    val rows = Seq(
      (1L, 100L, "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1"),
      (2L, 160L, "http://www.ex.com/a?b=2&a=1#frag"),
      (3L, 220L, "http://www.ex.com/a?a=1&b=2&fbclid=zz"),
      (4L, 280L, "http://www.ex.com/other"))
    def shaped(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.EventStream.dedupExactStream(
        df.select(col("_1").as("id"),
          timestamp_seconds(col("_2")).as("ts"),
          graft.ops.UrlOps.normalize(col("_3")).as("url_norm")),
        "url_norm", "ts", "10 minutes")
    val batch = shaped(rows.toDF()).select("id").as[Long].collect().toSet
    val mem = MemoryStream[(Long, Long, String)]
    val q = shaped(mem.toDF())
      .select("id").writeStream.format("memory").queryName("url_dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM url_dedup_stream").as[Long].collect().toSet
      assert(got == batch)
      assert(got.map(_ % 10).intersect(Set(1L, 4L)).size == 2 && got.size == 2,
        s"expected exactly the first spelling + the distinct URL, got $got")
    } finally q.stop()
  }

  test("repetitionFilter on a stream matches the batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val repDocs = Seq(
      (1L, (1 to 30).map(i => s"word$i").mkString(" ")),
      (2L, Seq.fill(12)("spam ham jam").mkString(" ")), // dup/top grams fire
      (3L, "dup\ndup\ndup\nunique"))
    val batch = graft.ops.TextAnalysis
      .repetitionFilter(repDocs.toDF("doc_id", "text"), "text")
      .select("doc_id", "keep", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val mem = MemoryStream[(Long, String)]
    val q = graft.ops.TextAnalysis
      .repetitionFilter(mem.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "keep", "drop_reason")
      .writeStream.format("memory").queryName("rep_stream")
      .outputMode("append").start()
    try {
      mem.addData(repDocs.take(1): _*)
      q.processAllAvailable()
      mem.addData(repDocs.drop(1): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, keep, drop_reason FROM rep_stream")
        .as[(Long, Boolean, Option[String])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == batch && batch.values.exists(!_._1))
    } finally q.stop()
  }

  test("chunkByTokens on a stream matches the batch chunks") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Chunking.chunkByTokens(
      docs.toDF("doc_id", "text"), "doc_id", "text", window = 3, stride = 2)
      .as[(Long, Int, Int, String)].collect().toSet

    val mem = MemoryStream[(Long, String)]
    val q = Chunking.chunkByTokens(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", window = 3, stride = 2)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      docs.foreach { d => mem.addData(d); q.processAllAvailable() }
      val got = spark.sql("SELECT * FROM chunk_stream")
        .as[(Long, Int, Int, String)].collect().toSet
      assert(got == batch)
      assert(got.exists(_._4 == "theta iota kappa")) // normalization applied mid-stream
    } finally q.stop()
  }

  test("Naive Bayes scoring on a stream matches the batch scores") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (100L, "greek", "alpha beta gamma"),
      (101L, "latin", "unus duo tres")).toDF("doc_id", "label", "text")
    val model = Classifier.trainNaiveBayes(train, "label", "doc_id", "text")
    val batch = Classifier.scoreNaiveBayes(
      docs.toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, String, Int, Double)].collect().toSet

    val mem = MemoryStream[(Long, String)]
    val q = Classifier.scoreNaiveBayes(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    try {
      docs.foreach { d => mem.addData(d); q.processAllAvailable() }
      val got = spark.sql("SELECT * FROM nb_stream")
        .as[(Long, String, Int, Double)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("HLL and Count-Min sketches accumulate as streaming state (complete == batch)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // mergeable register/counter state IS streaming aggregation state:
    // the same udaf runs unchanged under complete-mode micro-batches
    val rows = (0L until 300L).map(i => (s"e${i % 2}", i % 97))
    val batchHll = ops.Sketches.hllDistinct(
      rows.toDF("event_type", "user_id"), Seq("event_type"), "user_id")
      .as[(String, Double)].collect().toMap
    val mem = MemoryStream[(String, Long)]
    val q = ops.Sketches.hllDistinct(
      mem.toDF().toDF("event_type", "user_id"), Seq("event_type"), "user_id")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(120): _*); q.processAllAvailable()
      mem.addData(rows.drop(120): _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM hll_stream")
        .as[(String, Double)].collect().toMap
      assert(got == batchHll, "HLL registers must accumulate across micro-batches")
    } finally q.stop()

    val cmAgg = udaf(new ops.Sketches.CountMinAggregator(3, 32))
    val toks = (0 until 200).map(i => (s"t${i % 17}", 1L))
    val batchCm = toks.toDF("token", "w")
      .agg(cmAgg(xxhash64($"token"), $"w")).as[Seq[Long]].collect().head
    val mem2 = MemoryStream[(String, Long)]
    val q2 = mem2.toDF().toDF("token", "w")
      .agg(cmAgg(xxhash64($"token"), $"w").as("cm"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      toks.grouped(70).foreach { g => mem2.addData(g: _*); q2.processAllAvailable() }
      val got = spark.sql("SELECT cm FROM cm_stream").as[Seq[Long]].collect().head
      assert(got == batchCm, "Count-Min counters must accumulate across micro-batches")
    } finally q2.stop()
  }

  test("trailing-window features on a stream match the batch RANGE frame") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.TrailEvent
    // three users, timestamp ties included (events 5/6 share user 1, us=2500)
    val events = Seq(
      TrailEvent(1L, 1L, 1000L, 1.55),
      TrailEvent(2L, 2L, 1100L, -3.0),
      TrailEvent(3L, 1L, 1900L, 2.25),
      TrailEvent(4L, 2L, 2400L, 0.125),
      TrailEvent(5L, 1L, 2500L, 7.5),
      TrailEvent(6L, 1L, 2500L, 0.0625),
      TrailEvent(7L, 1L, 3100L, -0.5),
      TrailEvent(8L, 3L, 9000L, 4.0))
    val windowLen = 1000L
    val batch = graft.ops.Temporal.trailingWindow(
      events.toDF(), keys = Seq("user_id"), tsCol = "us", windowLen = windowLen,
      aggs = Seq(
        "n_win" -> count(lit(1)),
        "sum_win" -> sum(col("value").cast("decimal(18,4)")),
        "max_win" -> max(col("value"))))
      .select(col("event_id"), col("user_id"), col("us"), col("n_win"),
        col("sum_win").cast("double").as("sum_win"), col("max_win"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet

    val mem = MemoryStream[TrailEvent]
    val q = EventStream.trailingFeatures(mem.toDS(), windowLen)
      .writeStream.format("memory").queryName("trail_stream")
      .outputMode("append").start()
    try {
      // split MID-TIE-GROUP per the arrival contract's edge: events 5 and 6
      // share (user 1, us=2500) and arrive in the same batch; batch 2 opens
      // with a later event for the same user
      mem.addData(events.take(6): _*); q.processAllAvailable()
      mem.addData(events.drop(6): _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM trail_stream")
        .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
      assert(got == batch, "stream must reproduce the batch RANGE frame exactly")
    } finally q.stop()
  }

  test("as-of join on a stream matches the batch union-merge") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.AsOfEvent
    // rights (side 0) and lefts (side 1) interleaved; includes an
    // equal-timestamp probe (us=2000 both sides), a right-side tie
    // (us=1000, ties 3 and 9), and a key with no preceding right
    val evs = Seq(
      AsOfEvent(1L, 1000L, 0, 100L, 3L),
      AsOfEvent(1L, 1000L, 0, 101L, 9L),
      AsOfEvent(1L, 1500L, 1, 500L, 0L),
      AsOfEvent(1L, 2000L, 0, 102L, 1L),
      AsOfEvent(1L, 2000L, 1, 501L, 0L),
      AsOfEvent(2L, 3000L, 1, 502L, 0L),
      AsOfEvent(2L, 3500L, 0, 103L, 7L),
      AsOfEvent(2L, 4000L, 1, 503L, 0L))
    val left = evs.filter(_.side == 1)
      .map(e => (e.id, e.key, e.us)).toDF("id", "key", "us")
    val right = evs.filter(_.side == 0)
      .map(e => (e.key, e.us, e.tie)).toDF("key", "r_us", "tie")
    val batch = graft.ops.Temporal.asOfJoin(
      left, right, keys = Seq("key"),
      leftTs = "us", rightTs = "r_us", rightTie = "tie", rightPrefix = "m_")
      .select(col("id"), col("key"), col("us"), col("m_r_us"), col("m_tie"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet

    val mem = MemoryStream[AsOfEvent]
    val q = EventStream.asOfStream(mem.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(5): _*); q.processAllAvailable()
      mem.addData(evs.drop(5): _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM asof_stream")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(got == batch, "stream must reproduce the batch as-of matches")
    } finally q.stop()
  }

  test("funnel on a stream matches the batch chained-min aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.FunnelEvent
    val rnd = new scala.util.Random(23)
    val evs = (0 until 300).map { _ =>
      FunnelEvent((rnd.nextInt(20) + 1).toLong, rnd.nextInt(50).toLong, rnd.nextInt(3))
    }.sortBy(e => (e.us, e.step)) // feed in event-time order (arrival contract)
    val types = Vector("a", "b", "c")
    val batch = graft.ops.Temporal.funnel(
      evs.map(e => (e.user_id, e.us, types(e.step))).toDF("u", "us", "t"),
      "u", "us", types.map(t => t -> (col("t") === t)))
      .as[(Int, String, Long)].collect()
      .map(r => (r._1 - 1) -> r._3).toMap // batch steps are 1-based

    val mem = MemoryStream[FunnelEvent]
    val q = EventStream.funnelStream(mem.toDS(), nSteps = 3)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      evs.grouped(100).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val got = spark.sql("SELECT step, count(*) AS n FROM funnel_stream GROUP BY step")
        .as[(Int, Long)].collect().toMap
      assert((0 until 3).forall(s => got.getOrElse(s, 0L) == batch.getOrElse(s, 0L)),
        s"got=$got batch=$batch")
    } finally q.stop()
  }

  test("interval join on a stream matches the batch binned equi-join") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.{IntervalSide, PointSide}
    val rnd = new scala.util.Random(37)
    val intervals = (0 until 40).map { i =>
      val s = rnd.nextInt(1000).toLong * 1000000L
      IntervalSide((i % 3).toLong, i.toLong, s, s + (1 + rnd.nextInt(200)).toLong * 1000000L)
    }
    val points = (0 until 200).map { i =>
      PointSide((i % 3).toLong, 100L + i, rnd.nextInt(1300).toLong * 1000000L)
    }
    val batch = graft.ops.Temporal.intervalJoin(
      intervals.toDF(), points.toDF(), Seq("key"),
      "start_us", "end_us", "us", binWidth = 200000000L)
      .select(col("iid"), col("event_id")).as[(Long, Long)].collect().toSet

    val imem = MemoryStream[IntervalSide]
    val pmem = MemoryStream[PointSide]
    // unordered arrival across batches: the delay threshold must cover
    // the full event-time span (~22 min) or the advanced watermark
    // rightly drops batch-2 rows as late — which is streaming semantics,
    // not a parity bug
    val q = EventStream.intervalStream(
      imem.toDS(), pmem.toDS(), maxIntervalUs = 200L * 1000000L,
      delayThreshold = "2 hours")
      .writeStream.format("memory").queryName("interval_stream")
      .outputMode("append").start()
    try {
      imem.addData(intervals.take(20): _*); pmem.addData(points.take(100): _*)
      q.processAllAvailable()
      imem.addData(intervals.drop(20): _*); pmem.addData(points.drop(100): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT iid, event_id FROM interval_stream")
        .as[(Long, Long)].collect().toSet
      assert(got == batch, "stream pairs must equal the batch binned equi-join")
    } finally q.stop()
  }

  test("cohort retention on a stream matches the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.RetentionEvent
    val rnd = new scala.util.Random(29)
    val binLen = 100L
    val raw = (0 until 400).map { _ =>
      ((rnd.nextInt(30) + 1).toLong, rnd.nextInt(1000).toLong)
    }.sortBy(_._2) // event-time order (arrival contract)
    val batch = graft.ops.Temporal.cohortRetention(
      raw.toDF("user_id", "us"), "user_id", "us", binLen)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val mem = MemoryStream[RetentionEvent]
    val q = EventStream.retentionStream(mem.toDS())
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("append").start()
    try {
      raw.map { case (u, us) => RetentionEvent(u, us / binLen) }
        .grouped(150).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val got = spark.sql(
        "SELECT cohort_bin, period, count(*) AS n FROM retention_stream GROUP BY 1, 2")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == batch, s"stream deltas must aggregate to the batch matrix")
    } finally q.stop()
  }

  test("crawl ingest: WARC chunks -> HTTP decode -> extract -> incremental URL dedup == batch") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths}
    import graft.io.{Http, Warc}

    // one content-bearing page per (charset flavor); pages long enough
    // to survive extraction (>=25 chars + stopwords), chrome dropped
    def page(body: String, charset: String, declareHeader: Boolean,
        declareMeta: Boolean): Array[Byte] = {
      val meta = if (declareMeta)
        "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">"
      else ""
      val html = s"<html><head><title>t</title>$meta</head><body>" +
        s"<nav><a href=/>Home</a> <a href=/x>About</a></nav>" +
        s"<p>the crawled body says $body and this line is long enough</p></body></html>"
      val ct = if (declareHeader) s"text/html; charset=$charset" else "text/html"
      Http.encodeResponse(200, Seq("Content-Type" -> ct), html, charset)
    }
    val chromeOnly = Http.encodeResponse(200, Seq("Content-Type" -> "text/html"),
      "<html><body><nav><a href=/>Home</a></nav></body></html>", "utf-8")

    // duplicate-URL pairs spell ONE canonical URL differently; crawl
    // ids are monotone with crawl order (the stated arrival contract)
    val fileA = Seq(
      ("r01", "HTTP://WWW.Site.Example:80/a?utm_source=x&b=2&a=1",
        page("café history — first crawl", "utf-8", true, false)),
      ("r02", "http://news.other.example/p", page("plain page two", "utf-8", false, false)),
      ("r03", "http://indexed.example/old", page("already in the corpus", "utf-8", false, false)),
      ("r04", "http://chrome.example/empty", chromeOnly))
    val fileB = Seq(
      ("r13", "http://www.site.example/a?a=1&b=2#frag",
        page("café history — re-crawl spelled differently", "windows-1252", false, true)),
      ("r14", "http://fresh.example/three", page("a genuinely new page three", "utf-8", false, false)))
    val fileC = Seq(
      ("r21", "http://News.Other.Example:80/p", page("plain page two re-crawl", "utf-8", false, false)),
      ("r22", "HTTP://fresh.example:80/three?gclid=x", page("page three re-crawl", "utf-8", false, false)),
      ("r23", "http://fresh.example/four", page("the fourth page is new", "utf-8", false, false)))

    val drop = Files.createTempDirectory("crawl_ingest")
    def writeWarc(recs: Seq[(String, String, Array[Byte])], name: String, age: Int): Unit = {
      val tmp = s"/tmp/graft_crawl_src/$name"
      Warc.write(recs.toDF("id", "uri", "payload").repartition(1), tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".warc"))
        .findFirst().get()
      val dst = drop.resolve(s"$name.warc")
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - (30 - age * 10) * 1000L))
    }
    writeWarc(fileA, "a", 0)
    writeWarc(fileB, "b", 1)
    writeWarc(fileC, "c", 2)

    val corpusIndex = Seq("http://indexed.example/old").toDF("url_norm")

    // batch twin over ALL records at once
    val allRecs = Warc.read(spark, drop.toString)
    val batchSurvivors = graft.streaming.EventStream
      .crawlSurvivorsBatch(allRecs, corpusIndex)
      .as[(String, String, String)].collect().toSet

    // batch twin of the WAT sidecar: metadata rows for the batch
    // survivors only (the sidecar mirrors the deduped corpus)
    val batchWat = graft.streaming.EventStream.crawlWat(allRecs)
      .join(graft.streaming.EventStream.crawlSurvivorsBatch(allRecs, corpusIndex)
        .select(col("record_id")), Seq("record_id"), "left_semi")
      .as[(String, String, String)].collect().toSet

    val ckpt = Files.createTempDirectory("crawl_ckpt")
    val watRoot = Files.createTempDirectory("crawl_wat").toString
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[Set[(String, String, String)]]()
    val watBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    // COMMITTED sink: each micro-batch appends to a manifest-log table
    // with its batchId recorded in the snapshot (exactly-once), and the
    // persisted MinHash index is extended per batch under the same guard
    val sink = graft.streaming.EventStream.CommittedCrawlSink(
      s"$watRoot/table",
      org.apache.spark.sql.functions.xxhash64(col("url_norm")), nFiles = 1,
      dedupIndexPath = Some(s"$watRoot/dedup_index"))
    def startIngest() = graft.streaming.EventStream.crawlIngest(
      spark, drop.toString, ckpt.toString, corpusIndex,
      onWat = { wat =>
        // a REAL per-batch WAT archive, not just a frame in flight
        // (unwrap the crawl record id — the metadata writer re-wraps)
        import org.apache.spark.sql.functions.regexp_extract
        val n = watBatches.getAndIncrement()
        Warc.write(wat.select(
          regexp_extract(col("record_id"), "<urn:graft:([^>]+)>", 1).as("id"),
          col("uri"), col("wat_json")),
          s"$watRoot/batch-$n", memberGzip = true, warcType = "metadata")
      },
      committedSink = Some(sink)) { survivors =>
      perBatch.add(survivors.select("record_id", "url_norm", "extracted")
        .as[(String, String, String)].collect().toSet)
    }
    val q = startIngest()
    try {
      q.processAllAvailable()
      val batches = perBatch.toArray(Array.empty[Set[(String, String, String)]])
      assert(batches.length >= 3, s"expected >=3 micro-batches, got ${batches.length}")
      val streamed = batches.toSet.flatten
      assert(streamed === batchSurvivors,
        "union of per-batch survivors must equal the batch twin")
      val ids = streamed.map(_._1.stripPrefix("<urn:graft:").stripSuffix(">"))
      assert(ids === Set("r01", "r02", "r14", "r23"),
        s"first crawl wins, re-crawls and indexed/chrome pages drop; got $ids")
      // the re-crawls were dropped INCREMENTALLY: later batches must not
      // re-emit earlier batches' URLs
      val urlsSeen = scala.collection.mutable.Set.empty[String]
      batches.foreach { b =>
        val urls = b.map(_._2)
        assert(urls.intersect(urlsSeen.toSet).isEmpty,
          "a later micro-batch re-emitted an already-ingested URL")
        urlsSeen ++= urls
      }
      // charset leg is live: the utf-8 and cp1252 spellings of café both
      // decoded correctly in whichever batch won
      assert(streamed.exists(_._3.contains("café")))

      // WAT sidecar leg: every batch with survivors wrote a real
      // metadata archive; their union (re-read from disk, so the
      // archives are proven consumable) equals the batch twin, and the
      // re-crawls' metadata was dropped with their pages
      import org.apache.spark.sql.functions.{decode, regexp_extract}
      assert(watBatches.get() >= 3, s"expected >=3 WAT archives, got ${watBatches.get()}")
      val streamedWat = (0 until watBatches.get()).flatMap { i =>
        Warc.read(spark, s"$watRoot/batch-$i")
          .select(
            regexp_extract(col("record_id"), "<urn:graft:meta:([^>]+)>", 1).as("id"),
            col("target_uri"), decode(col("payload"), "UTF-8").as("wat_json"),
            col("refers_to"))
          .as[(String, String, String, String)].collect()
      }.toSet
      val expectWat = batchWat.map { case (rid, uri, json) =>
        (rid.stripPrefix("<urn:graft:").stripSuffix(">"), uri, json)
      }
      assert(streamedWat.map(t => (t._1, t._2, t._3)) == expectWat,
        "accumulated per-batch WAT sidecar != batch twin")
      assert(streamedWat.map(_._1) == Set("r01", "r02", "r14", "r23"),
        "WAT sidecar must mirror the deduped corpus exactly")
      // every metadata record points back at its page record
      assert(streamedWat.forall(t => t._4 == s"<urn:graft:${t._1}>"))
      // the envelope JSON is live content, not a stub
      assert(streamedWat.forall(_._3.startsWith("{\"envelope\":{\"status\":200")))

      // committed-table sink: the stream-appended table reads back equal
      // to the batch twin THROUGH the log, one version per non-empty
      // batch, and version 1 is exactly the first batch (time travel)
      import graft.ops.Layout
      val table = s"$watRoot/table"
      val snap = Layout.latestSnapshot(spark, table).get
      assert(snap.version == batches.count(_.nonEmpty).toLong,
        s"one commit per non-empty batch; got v${snap.version}")
      val tableRows = Layout.readCommitted(spark, table)
        .select("record_id", "url_norm", "extracted")
        .as[(String, String, String)].collect().toSet
      assert(tableRows == batchSurvivors,
        "committed crawl table != batch twin")
      val firstBatch = batches.find(_.nonEmpty).get
      assert(Layout.readVersion(spark, table, 1)
        .select("record_id", "url_norm", "extracted")
        .as[(String, String, String)].collect().toSet == firstBatch,
        "snapshot v1 must be exactly the first ingested batch")

      // --- exactly-once: an injected foreachBatch REPLAY is a no-op ---
      // the last committed batchId rides in the snapshot header; replay
      // it with different content and nothing may change
      val hwm = snap.txns("crawl_ingest")
      val replayRows = Seq(("<urn:graft:r99>", "http://replay.example/x",
        "this replayed batch must not land")).toDF("record_id", "url_norm", "extracted")
      graft.streaming.EventStream.sinkToCommittedTable(
        replayRows, table, org.apache.spark.sql.functions.xxhash64(col("url_norm")),
        nFiles = 1, txn = Some("crawl_ingest" -> hwm))
      assert(Layout.latestSnapshot(spark, table).get.version == snap.version,
        "replayed batchId must not commit a new version")
      assert(Layout.readCommitted(spark, table).count() == tableRows.size.toLong,
        "replayed batchId must not duplicate rows")

      // --- persisted dedup index: extended per batch, same guard ---
      import graft.ops.Dedup
      val idxPath = s"$watRoot/dedup_index"
      val pidx = Dedup.minhashOpenIndex(spark, idxPath)
      val shingledIds = spark.read.parquet(s"$idxPath/shingled")
        .select("id").as[String].collect().toSet
      assert(shingledIds == tableRows.map(_._1),
        "persisted MinHash index must cover exactly the committed corpus")
      assert(Dedup.minhashIndexTxns(spark, idxPath) == Map("crawl_ingest" -> hwm))
      assert(!Dedup.minhashExtendIndexIdempotent(
        replayRows, "record_id", "extracted", pidx, "crawl_ingest", hwm),
        "replayed index extension must be a no-op")
      assert(spark.read.parquet(s"$idxPath/shingled").count() ==
        shingledIds.size.toLong)

      // --- downstream consumer: a derived table follows the committed
      // crawl table through its OWN high-water mark (incrementalEtl) —
      // bootstrap here, then exactly one window for the restart batch
      val derived = s"$watRoot/derived"
      val tfm: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => df.select(col("record_id"), col("url_norm"),
          org.apache.spark.sql.functions.length(col("extracted")).as("n_chars"))
      val e1 = Layout.incrementalEtl(spark, table, derived, tfm,
        org.apache.spark.sql.functions.xxhash64(col("url_norm")), 1)
      assert(e1.fromVersion == 0L && e1.rowsAppended == tableRows.size.toLong)

      // --- RESTART: a new ingest instance on the same checkpoint and
      // table rebuilds its URL state from the COMMITTED table, so a
      // re-crawl of an already-ingested URL is dropped after restart ---
      q.stop()
      val fileD = Seq(
        ("r31", "http://news.other.example/p",
          page("plain page two re-crawled after restart", "utf-8", false, false)),
        ("r32", "http://fresh.example/five",
          page("a genuinely new fifth page after restart", "utf-8", false, false)))
      writeWarc(fileD, "d", 3)
      val q2 = startIngest()
      try q2.processAllAvailable() finally q2.stop()
      val finalSnap = Layout.latestSnapshot(spark, table).get
      assert(finalSnap.version == snap.version + 1,
        "the restarted stream must commit exactly one more version")
      assert(finalSnap.txns("crawl_ingest") == hwm + 1)
      val finalRows = Layout.readCommitted(spark, table)
        .select("record_id", "url_norm", "extracted")
        .as[(String, String, String)].collect().toSet
      val twinAll = graft.streaming.EventStream
        .crawlSurvivorsBatch(Warc.read(spark, drop.toString), corpusIndex)
        .as[(String, String, String)].collect().toSet
      assert(finalRows == twinAll,
        "after restart, committed table must equal the 4-file batch twin")
      val finalIds = finalRows.map(_._1.stripPrefix("<urn:graft:").stripSuffix(">"))
      assert(finalIds == Set("r01", "r02", "r14", "r23", "r32"),
        s"restart must drop the re-crawl (r31) and ingest the new page (r32); got $finalIds")
      // the persisted index followed the restart batch too
      assert(spark.read.parquet(s"$idxPath/shingled")
        .select("id").as[String].collect().toSet == finalRows.map(_._1))
      assert(Dedup.minhashIndexTxns(spark, idxPath) ==
        Map("crawl_ingest" -> (hwm + 1)))
      // the consumer reads ONLY the restart batch's window and lands on
      // the full recompute; a third run is a provable no-op
      val e2 = Layout.incrementalEtl(spark, table, derived, tfm,
        org.apache.spark.sql.functions.xxhash64(col("url_norm")), 1)
      assert(e2.fromVersion == snap.version &&
        e2.toVersion == finalSnap.version && e2.rowsAppended == 1L,
        s"consumer window diverged: $e2")
      val derivedRows = Layout.readCommitted(spark, derived)
        .select("record_id", "url_norm", "n_chars")
        .as[(String, String, Int)].collect().toSet
      val derivedWant = tfm(Layout.readCommitted(spark, table))
        .as[(String, String, Int)].collect().toSet
      assert(derivedRows == derivedWant,
        "derived table != transform(committed crawl table)")
      assert(Layout.incrementalEtl(spark, table, derived, tfm,
        org.apache.spark.sql.functions.xxhash64(col("url_norm")), 1).caughtUp)
    } finally q.stop()
  }

  test("incremental inverted index across micro-batches == full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // three append-only waves of disjoint doc ids; shared tokens across
    // waves make the df re-derivation load-bearing (a stale df from an
    // earlier batch would survive a naive merge)
    val waves = Seq(
      Seq((1L, "the cat sat"), (2L, "the dog")),
      Seq((3L, "cat cat cat"), (4L, "a fresh dog barks")),
      Seq((5L, "the fresh cat"), (6L, "entirely new tokens here")))
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idx_ckpt").toString
    val snapshots = new java.util.concurrent.ConcurrentLinkedQueue[
      Set[(String, Long, Long, Long, Long, Long)]]()
    val q = graft.streaming.EventStream.indexMaintenanceStream(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", ckpt) { idx =>
      snapshots.add(idx
        .select(col("token"), col("doc_id"), col("tf"), col("df"),
          col("first_pos"), col("last_pos"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet)
    }
    try {
      var fed = Seq.empty[(Long, String)]
      waves.foreach { w =>
        mem.addData(w: _*)
        q.processAllAvailable()
        fed = fed ++ w
        // the maintained index after THIS wave == a from-scratch rebuild
        // over everything fed so far, row for row
        val rebuilt = graft.ops.Search.invertedIndex(
          fed.toDF("doc_id", "text"), "doc_id", "text")
          .as[(String, Long, Long, Long, Long, Long)].collect().toSet
        val latest = snapshots.toArray(
          Array.empty[Set[(String, Long, Long, Long, Long, Long)]]).last
        assert(latest == rebuilt,
          s"after wave ${fed.size / 2}: stream index != rebuild")
      }
      assert(snapshots.size() >= 3, s"expected >=3 micro-batches, got ${snapshots.size()}")
    } finally q.stop()
  }

  test("indexMaintenanceStream skips replayed batchIds and refuses a used checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idx_ckpt2").toString
    var merges = 0
    val q = graft.streaming.EventStream.indexMaintenanceStream(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", ckpt) { _ => merges += 1 }
    try {
      mem.addData((1L, "alpha beta"))
      q.processAllAvailable()
      assert(merges == 1)
    } finally q.stop()
    // the checkpoint now holds a commit: a fresh instance must refuse to
    // resume (its index state is session-local, not checkpointed — a
    // resume would mark batch 0 done while the index restarts empty)
    val mem2 = MemoryStream[(Long, String)]
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.EventStream.indexMaintenanceStream(
        mem2.toDS().toDF("doc_id", "text"), "doc_id", "text", ckpt) { _ => () }
    }
    assert(ex.getMessage.contains("fresh checkpoint"))
  }

  test("DSIR scoring on a stream matches the batch weights") {
    implicit val sqlCtx = spark.sqlContext
    val target = Seq((100L, "alpha beta alpha")).toDF("doc_id", "text")
    val raw = docs.toDF("doc_id", "text")
    val model = Dsir.trainImportance(target, raw, "doc_id", "text")
    val batch = Dsir.scoreImportance(raw, "doc_id", "text", model)
      .as[(Long, Int, Double)].collect().toSet

    val mem = MemoryStream[(Long, String)]
    val q = Dsir.scoreImportance(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      docs.foreach { d => mem.addData(d); q.processAllAvailable() }
      val got = spark.sql("SELECT * FROM dsir_stream")
        .as[(Long, Int, Double)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("PCA projection on a stream matches the batch projection bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Pca
    // fit once on a batch corpus (the nightly job); project the firehose
    // with the broadcast-literal components — map-only, so the stream
    // must agree to the last bit
    val vecs = (0L until 30L).map { i =>
      (i, (0 until 6).map(j => (math.sin(i * 1.7 + j) * 0.4).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val model = Pca.fit(corpus, "embedding", k = 3, dim = 6)
    val batch = Pca.project(corpus, "embedding", model)
      .select("vec_id", "pc_1", "pc_2", "pc_3")
      .as[(Long, Double, Double, Double)].collect().toSet

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Pca.project(mem.toDF().toDF("vec_id", "embedding"), "embedding", model)
      .select("vec_id", "pc_1", "pc_2", "pc_3")
      .writeStream.format("memory").queryName("pca_stream")
      .outputMode("append").start()
    try {
      mem.addData(vecs.take(11): _*)
      q.processAllAvailable()
      mem.addData(vecs.drop(11): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM pca_stream")
        .as[(Long, Double, Double, Double)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }
}
