package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.{AsOfEvent, FunnelEvent, IntervalSide, PointSide, RetentionEvent, TrailEvent}

/** Executable contracts for the hand-built streaming temporal twins:
  * (1) violations of the cross-batch nondecreasing-event-time arrival
  * contract fail the query LOUDLY instead of silently corrupting
  * windows/matches/stages (the state to detect them was already there);
  * (2) `intervalStream`'s `maxIntervalUs` bound is enforced per row, not
  * advisory — an over-wide interval would otherwise silently lose its
  * tail points to state eviction; (3) the bounded-state claim in the
  * scaladocs is measured: 100 micro-batches plateau the state store.
  */
class StreamingContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The failure surfaces as a StreamingQueryException whose cause chain
    * holds the twin's IllegalStateException (or the assert_true error).
    */
  private def failureMessageOf(body: => Unit): String = {
    val ex = intercept[Throwable](body)
    Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
  }

  test("trailingFeatures fails loudly on a late cross-batch event") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TrailEvent]
    val q = EventStream.trailingFeatures(mem.toDS(), windowLenUs = 1000L)
      .writeStream.format("memory").queryName("trail_late")
      .outputMode("append").start()
    try {
      mem.addData(TrailEvent(1L, 7L, 5000L, 1.0)); q.processAllAvailable()
      mem.addData(TrailEvent(2L, 7L, 1000L, 1.0)) // predates state max 5000
      val msg = failureMessageOf(q.processAllAvailable())
      assert(msg.contains("trailingFeatures: late event for key=7"), msg)
    } finally q.stop()
  }

  test("asOfStream fails loudly on a late cross-batch event (left-only state too)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsOfEvent]
    val q = EventStream.asOfStream(mem.toDS())
      .writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()
    try {
      // batch 1 is a LEFT-only probe: the old Option[AsOfState] never
      // recorded state for it, so this specifically pins that left
      // events now advance maxUs as well
      mem.addData(AsOfEvent(3L, 9000L, 1, 500L, 0L)); q.processAllAvailable()
      mem.addData(AsOfEvent(3L, 2000L, 0, 100L, 0L)) // late right row
      val msg = failureMessageOf(q.processAllAvailable())
      assert(msg.contains("asOfStream: late event for key=3"), msg)
    } finally q.stop()
  }

  test("funnelStream fails loudly on a late cross-batch event") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = EventStream.funnelStream(mem.toDS(), nSteps = 2)
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      // the step-1 event does NOT advance the funnel (user needs step 0
      // first) — maxUs must still move, or the late step-0 would be
      // silently accepted as the stage-0 time
      mem.addData(FunnelEvent(4L, 8000L, 1)); q.processAllAvailable()
      mem.addData(FunnelEvent(4L, 3000L, 0))
      val msg = failureMessageOf(q.processAllAvailable())
      assert(msg.contains("funnelStream: late event for key=4"), msg)
    } finally q.stop()
  }

  test("retentionStream fails loudly only when a late event predates the cohort") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RetentionEvent]
    val q = EventStream.retentionStream(mem.toDS())
      .writeStream.format("memory").queryName("ret_late")
      .outputMode("append").start()
    try {
      // a new bin BETWEEN cohort and max is order-insensitive (the delta
      // it emits is identical either way) — must NOT fail
      mem.addData(RetentionEvent(5L, 10L)); q.processAllAvailable()
      mem.addData(RetentionEvent(5L, 14L)); q.processAllAvailable()
      mem.addData(RetentionEvent(5L, 12L)); q.processAllAvailable()
      val ok = spark.sql("SELECT period FROM ret_late WHERE user_id = 5")
        .as[Long].collect().toSet
      assert(ok == Set(0L, 4L, 2L), s"mid-order bin must still emit its delta: $ok")
      // a bin BEFORE the cohort corrupts the cohort assignment — must fail
      mem.addData(RetentionEvent(5L, 8L))
      val msg = failureMessageOf(q.processAllAvailable())
      assert(msg.contains("retentionStream: late event for user=5"), msg)
    } finally q.stop()
  }

  test("intervalStream rejects an interval wider than maxIntervalUs per row") {
    implicit val sqlCtx = spark.sqlContext
    val imem = MemoryStream[IntervalSide]
    val pmem = MemoryStream[PointSide]
    // epoch-scale event times: near-zero timestamps trip the watermark
    // eviction machinery (watermark clamps at 0), which is streaming
    // semantics, not what this spec is about
    val base = 1000000000L * 1000000L
    val q = EventStream.intervalStream(
      imem.toDS(), pmem.toDS(), maxIntervalUs = 1000000L)
      .writeStream.format("memory").queryName("interval_bound")
      .outputMode("append").start()
    try {
      // conforming interval + a point in it: passes
      imem.addData(IntervalSide(1L, 10L, base, base + 1000000L))
      pmem.addData(PointSide(1L, 100L, base + 500000L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM interval_bound").count() == 1L)
      // over-wide interval: the assert_true row check fails the query
      imem.addData(IntervalSide(1L, 11L, base, base + 5000000L))
      val msg = failureMessageOf(q.processAllAvailable())
      assert(msg.contains("intervalStream: interval iid=11 spans 5000000 us > maxIntervalUs=1000000"),
        msg)
    } finally q.stop()
  }

  test("temporal twin state plateaus over 100 micro-batches (bounded-state claim)") {
    implicit val sqlCtx = spark.sqlContext
    // trailingFeatures: 5 users, one event per user per batch, event time
    // advancing 1000 us per batch, window 10,000 us → the per-key buffer
    // can never hold more than 11 events no matter how many batches run,
    // and the state store holds exactly one row per key.
    val mem = MemoryStream[TrailEvent]
    val q = EventStream.trailingFeatures(mem.toDS(), windowLenUs = 10000L)
      .writeStream.format("memory").queryName("trail_bounded")
      .outputMode("append").start()
    val stateRows = List.newBuilder[Long]
    try {
      (0 until 100).foreach { b =>
        val evs = (0 until 5).map(u =>
          TrailEvent(b * 5L + u, u.toLong, b * 1000L, 1.0))
        mem.addData(evs: _*); q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.head.numRowsTotal
      }
      val rows = stateRows.result()
      assert(rows.nonEmpty && rows.drop(5).forall(_ == 5L),
        s"state rows must plateau at one per key: ${rows.distinct}")
      // the buffer size is visible in the output as n_win — time-bounded,
      // not batch-count-bounded
      val maxWin = spark.sql("SELECT max(n_win) FROM trail_bounded").head.getLong(0)
      assert(maxWin <= 11L, s"window buffer grew past the time bound: $maxWin")

      // asOfStream under the same load: state is ONE row per key forever
      val amem = MemoryStream[AsOfEvent]
      val aq = EventStream.asOfStream(amem.toDS())
        .writeStream.format("memory").queryName("asof_bounded")
        .outputMode("append").start()
      val aRows = List.newBuilder[Long]
      try {
        (0 until 100).foreach { b =>
          val evs = (0 until 5).flatMap(k => Seq(
            AsOfEvent(k.toLong, b * 1000L, 0, b * 10L + k, 0L),
            AsOfEvent(k.toLong, b * 1000L + 500L, 1, b * 10L + k, 0L)))
          amem.addData(evs: _*); aq.processAllAvailable()
          val p = aq.lastProgress
          if (p != null && p.stateOperators.nonEmpty)
            aRows += p.stateOperators.head.numRowsTotal
        }
        val ar = aRows.result()
        assert(ar.nonEmpty && ar.drop(5).forall(_ == 5L),
          s"as-of state must stay one row per key: ${ar.distinct}")
      } finally aq.stop()
    } finally q.stop()
  }
}
