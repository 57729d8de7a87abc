package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins and event-sequence analytics Spark lacks as built-ins:
  * as-of join, interval (range) join, and funnel counting.
  *
  * The reference's domain is position-aligned reads, but its event-table
  * side (`read_info`, insertion event tables) plus any 100 TB training-data
  * pipeline needs the time axis: "which experiment batch was this read
  * sequenced under" is an as-of lookup, "which reads overlap this window"
  * is an interval join. Both are implemented WITHOUT inequality joins
  * (a naive `ON l.ts >= r.ts` is a broadcast-nested-loop or cartesian in
  * Spark — quadratic and a non-starter at scale):
  *
  *  - [[asOfJoin]] is the union-merge formulation: tag both inputs, union,
  *    ONE exchange on the key, ONE sort by (ts, side), and a running
  *    `last(ignoreNulls)` window carries the most recent right row forward
  *    into each left row. Cost is one shuffle of left+right — the same
  *    lower bound a dedicated merge-join-as-of physical operator pays.
  *  - [[intervalJoin]] buckets time into fixed-width bins: an interval
  *    covers ceil(len/width)+1 bins, an event lands in exactly one, and
  *    the pair meets in an EQUI-join on (keys, bin) — partitionable,
  *    AQE-skew-splittable, no cross product. Each qualifying pair is
  *    emitted exactly once (the event's bin is unique, no dedup pass).
  */
object Temporal {

  /** For each left row, attach the single most recent right row with
    * `right(rightTs) <= left(leftTs)` and equal keys (nulls when no right
    * row precedes). Ties on the timestamp resolve to the right row with
    * the largest `rightTie`; (key, rightTs, rightTie) must be unique for
    * the result to be well-defined (pre-aggregate the right side if not).
    *
    * Right payload columns come back prefixed with `rightPrefix`. The
    * timestamp columns must be mutually comparable — pass integer epochs
    * (e.g. `unix_micros`) when cross-engine parity matters.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one key column")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val rStruct = struct(payloadCols.map(col): _*)
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"),
        lit(null).cast(rType).as("__rrow")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(rightTie).cast("long").as("__tie"),
        lit(null).cast(l.schema("__lrow").dataType).as("__lrow"),
        rStruct.as("__rrow")): _*)

    // Right rows sort before left at equal ts (side 0 < 1) => `<=` match
    // semantics; among right rows the largest tie sorts last and wins the
    // running last(). One exchange + one sort — the merge-as-of plan.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftOut = left.columns.toSeq.map(c => col("__lrow").getField(c).as(c))
    val rightOut = payloadCols.map(c =>
      col("__match").getField(c).as(rightPrefix + c))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Inner join of `intervals` [startCol, endCol) with `events` at
    * `tsCol`, equal `keys` — via fixed-width time bins. `binWidth` should
    * be on the order of the typical interval length: an interval explodes
    * into its covered bins (len/width + 1 rows), an event maps to one bin,
    * and the final predicate keeps exact overlaps only. All three columns
    * must share one integer unit (e.g. microseconds).
    */
  def intervalJoin(
      intervals: DataFrame,
      events: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tsCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals.withColumn(
      "__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor((col(endCol) - 1) / binWidth).cast("long"))))
    val evb = events.withColumn("__bin", floor(col(tsCol) / binWidth).cast("long"))
    binned
      .join(evb, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Per-row trailing-window features: each row of `df` gains one column
    * per `(name, agg)` entry, the aggregate evaluated over the rows of the
    * same key whose `tsCol` lies in `[ts - windowLen, ts]` (inclusive both
    * ends — RANGE frame semantics, so timestamp ties are all peers and the
    * result is deterministic under any physical row order).
    *
    * The canonical feature-engineering shape ("events this user fired in
    * the last hour"): ONE exchange on the keys, ONE sort by (keys, ts),
    * and every requested aggregate shares that frame — Spark evaluates
    * all of them in a single Window operator, so adding a feature costs
    * no extra shuffle or sort. `tsCol` must be an integer epoch (e.g.
    * `unix_micros`) in the same unit as `windowLen`.
    *
    * Scale note: the frame is bounded by time, not row count, so state is
    * O(rows inside the window) per key; a key hot enough to overflow one
    * task (a bot user at 100 TB) needs an upstream per-(key, coarse-bin)
    * pre-aggregation — compose with [[intervalJoin]]'s binning — rather
    * than salting, which a running window can't absorb.
    */
  def trailingWindow(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      windowLen: Long,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "trailingWindow needs at least one key column")
    require(windowLen >= 0, s"windowLen must be >= 0, got $windowLen")
    require(aggs.nonEmpty, "trailingWindow needs at least one aggregate")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol))
      .rangeBetween(-windowLen, Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, agg)) =>
      d.withColumn(name, agg.over(w))
    }
  }

  /** Cohort retention matrix: users are cohorted by the time bin of
    * their FIRST event (`bin = ts div binLen`), and each (cohort_bin,
    * period) cell counts the users of that cohort active `period` bins
    * after their first one. The product-analytics staple ("of the users
    * acquired in week W, how many came back in week W+k").
    *
    * Scale shape: ONE exchange on the user key — a single aggregate
    * computes `min(bin)` and `collect_set(bin)` together (per-user state
    * is bounded by the number of calendar bins in the dataset's time
    * span, not by event count, so a bot user with 10^9 events still
    * holds ≤ #periods entries); explode + the (cohort, period) count is
    * a second, cardinality-#cells exchange. No distinct pre-pass, no
    * join, no window. `tsCol` must be a non-negative integer epoch in
    * the same unit as `binLen` (div truncation == floor only for ≥ 0).
    *
    * Output: (cohort_bin, period, n_users); period 0 is the cohort size.
    */
  def cohortRetention(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      binLen: Long): DataFrame = {
    require(binLen > 0, s"binLen must be > 0, got $binLen")
    df.select(col(userCol), expr(s"$tsCol div ${binLen}L").as("bin"))
      .groupBy(col(userCol))
      .agg(min(col("bin")).as("cohort_bin"), collect_set(col("bin")).as("__bins"))
      .select(col("cohort_bin"), explode(col("__bins")).as("bin"))
      .groupBy(col("cohort_bin"), (col("bin") - col("cohort_bin")).as("period"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Funnel counting: how many entities complete step 1, step 1→2 (with
    * step 2 STRICTLY after their step-1 time), step 1→2→3, … Steps are
    * (name, predicate) in order. Returns (step INT, name, n_users).
    *
    * Each stage is `min(ts)` over the survivors of the previous stage —
    * a chain of aggregates all keyed on `keyCol`, so every exchange
    * reuses the same partitioning (and the broadcast of the shrinking
    * survivor frame makes later stages cheap). No per-user event-list
    * collection, no window sort over raw events.
    */
  def funnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var survivors: DataFrame = null
    val counts = steps.zipWithIndex.map { case ((name, cond), i) =>
      val stage = events.filter(cond)
      survivors =
        if (i == 0) stage.groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
        else stage
          .join(survivors.select(col(keyCol), col("__t")), Seq(keyCol))
          .filter(col(tsCol) > col("__t"))
          .groupBy(col(keyCol))
          .agg(min(col(tsCol)).as("__t"))
      survivors.agg(count(lit(1)).as("n_users"))
        .select(
          lit(i + 1).cast("int").as("step"),
          lit(name).as("name"),
          col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }
}
