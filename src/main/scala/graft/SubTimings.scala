package graft

/** Per-query stage timings recorded by the fixture-writing queries
  * themselves (the shard/archive write vs the plan under test), so the
  * bench artifact attributes their wide drift bands to the stage that
  * actually moved instead of masking plan regressions behind
  * file-system noise. Thread-safe (Verify runs queries from multiple
  * submitting threads); [[Bench]] and [[DriftProbe]] reset before and
  * snapshot after each measured run. Recording costs two nanoTime
  * calls per stage — inert outside the bench mains.
  */
object SubTimings {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Double]]()

  /** Time `body` under (query, stage); re-entrant stages accumulate. */
  def time[T](query: String, stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val secs = (System.nanoTime() - t0) / 1e9
      m.computeIfAbsent(query,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
        .merge(stage, secs, (a, b) => (a + b): java.lang.Double)
    }
  }

  def reset(query: String): Unit = { m.remove(query): Unit }

  def get(query: String): Map[String, Double] = {
    val inner = m.get(query)
    if (inner == null) Map.empty
    else {
      val b = Map.newBuilder[String, Double]
      inner.forEach((k, v) => b += (k -> (v: Double)))
      b.result()
    }
  }
}
