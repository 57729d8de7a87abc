package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Temporal

/** Temporal-operator queries over the `events` table: as-of join,
  * interval join, funnel. All timestamps are compared as integer
  * microseconds on BOTH engines (`unix_micros` / `epoch_us`) so the
  * parquet ns→µs truncation can never flip a comparison.
  */
object Events {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase matched to the user's most recent click at
    // or before it. The right side is pre-aggregated to one row per
    // (user, µs) — max event_id wins — so the match is well-defined; the
    // DuckDB oracle is a native ASOF LEFT JOIN over the same dedup.
    "q_asof_join" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id"),
          unix_micros(col("ts")).as("purchase_us"))
      val clicks = events.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("click_us"))
        .agg(max(col("event_id")).as("click_id"))
      Temporal.asOfJoin(
        purchases, clicks,
        keys = Seq("user_id"),
        leftTs = "purchase_us", rightTs = "click_us", rightTie = "click_id",
        rightPrefix = "")
        .select(
          col("purchase_id"), col("user_id"), col("purchase_us"),
          col("click_id"),
          col("click_us"),
          (col("purchase_us") - col("click_us")).as("gap_us"))
        .orderBy(col("purchase_id"))
    }),

    // Interval join: purchases inside [error, error+10min) windows of the
    // same user, aggregated per error. Bin-bucketed equi-join — no
    // inequality join, no cartesian; zero-match errors kept by the final
    // left join back onto the (small) interval frame.
    "q_range_join" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
      val errors = events.filter(col("event_type") === "error")
        .select(
          col("event_id").as("err_id"),
          col("user_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + lit(600000000L)).as("end_us"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id"),
          unix_micros(col("ts")).as("us"),
          col("value"))
      val pairs = Temporal.intervalJoin(
        errors, purchases,
        keys = Seq("user_id"),
        startCol = "start_us", endCol = "end_us", tsCol = "us",
        binWidth = 600000000L)
      val perErr = pairs.groupBy(col("err_id"))
        .agg(
          count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("sum_value"))
      errors.join(perErr, Seq("err_id"), "left")
        .select(
          col("err_id"), col("user_id"), col("start_us"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy(col("err_id"))
    }),

    // Funnel: users who viewed, then clicked strictly after their first
    // view, then purchased strictly after that first qualifying click.
    // Trailing time-range features: per event, the user's activity count,
    // exact (decimal) value sum, and max value over the preceding hour
    // (RANGE frame, inclusive), plus the gap to the user's previous event
    // (lag over a tie-broken total order). One exchange on user_id; the
    // lag's (us, event_id) sort satisfies the RANGE frame's (us) ordering
    // prefix, so both windows ride a single sort.
    "q_rolling_features" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("value"))
      val lagW = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Temporal.trailingWindow(
        events.withColumn("gap_us", col("us") - lag(col("us"), 1).over(lagW)),
        keys = Seq("user_id"), tsCol = "us", windowLen = 3600000000L,
        aggs = Seq(
          "n_1h" -> count(lit(1)),
          // decimal sum inside the frame, cast outside it (`.over` must
          // attach to the aggregate itself, not a cast around it)
          "sum_1h" -> sum(col("value").cast("decimal(18,4)")),
          "max_1h" -> max(col("value"))))
        .select(col("event_id"), col("user_id"), col("us"),
          col("n_1h"), col("sum_1h").cast("double").as("sum_1h"),
          col("max_1h"), col("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Weekly cohort retention: cohort = week of a user's first event;
    // each (cohort_week, period) cell counts that cohort's users active
    // `period` weeks later. One user-keyed aggregate (min + bounded
    // bin set), no distinct pre-pass, no join, no window.
    "q_cohort_retention" -> ((s, dir) =>
      Temporal.cohortRetention(
        Tables(s, dir, "events").withColumn("us", unix_micros(col("ts"))),
        "user_id", "us", 604800000000L)
        .withColumnRenamed("cohort_bin", "cohort_week")
        .orderBy(col("cohort_week"), col("period"))),

    "q_funnel" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      Temporal.funnel(events, "user_id", "us", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
        .orderBy(col("step"))
    }))

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, epoch_us(ts))
        |SELECT p.purchase_id, p.user_id, p.purchase_us,
        |  c.click_id, c.click_us,
        |  p.purchase_us - c.click_us AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
        |ORDER BY purchase_id""".stripMargin,
    "q_range_join" ->
      """WITH err AS (
        |  SELECT event_id AS err_id, user_id, epoch_us(ts) AS start_us,
        |    epoch_us(ts) + 600000000 AS end_us
        |  FROM events WHERE event_type = 'error'),
        |pur AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e.err_id, e.user_id, e.start_us,
        |  count(p.event_id) AS n_purchases,
        |  CAST(COALESCE(SUM(CAST(p.value AS DECIMAL(18,4))), 0) AS DOUBLE)
        |    AS sum_value
        |FROM err e LEFT JOIN pur p
        |  ON e.user_id = p.user_id AND p.us >= e.start_us AND p.us < e.end_us
        |GROUP BY e.err_id, e.user_id, e.start_us
        |ORDER BY e.err_id""".stripMargin,
    "q_rolling_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
        |SELECT event_id, user_id, us,
        |  count(*) OVER tw AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER tw AS DOUBLE) AS sum_1h,
        |  max(value) OVER tw AS max_1h,
        |  us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS gap_us
        |FROM e
        |WINDOW tw AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_cohort_retention" ->
      """WITH ub AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS bin
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(bin) AS cohort_week FROM ub GROUP BY user_id)
        |SELECT c.cohort_week, ub.bin - c.cohort_week AS period,
        |  count(*) AS n_users
        |FROM ub JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS step, 'view' AS name, count(*) AS n_users FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS INT), 'click', count(*) FROM s2
        |  UNION ALL
        |  SELECT CAST(3 AS INT), 'purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin)
}
