package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A2 `get_quality_dist` (ref: seqtables.py:1328-1377,
  * numpy_ops.py:137-371): FASTQC-style per-position-bin quality statistics.
  *
  * Bin presets mirror the reference: `fastqc` = positions 1..9 singly then
  * width-5 ranges (and width-10 past 300); `even` = 10 equal-width bins over
  * the window. Phred 0 (null quality / uncovered) is excluded when
  * `excludeNullQuality`, like the reference default.
  *
  * One hash aggregate keyed by bin (cardinality ≈ dozens): percentile is the
  * only non-algebraic stat, and Spark's exact `percentile` is fine at bin
  * granularity; swap to `percentile_approx` at extreme scale.
  *
  * Output: (bin_label, bin_start, bin_end, n, mean, median, min, max,
  * p10, p25, p50, p75, p90).
  */
object QualityDist {

  def fastqcBins(maxPos: Int): Seq[(Int, Int)] =
    (1 to 9).map(i => (i, i)) ++
      (10 to math.min(299, maxPos) by 5).map(p => (p, p + 4)) ++
      (300 to maxPos by 10).map(p => (p, p + 9))

  def evenBins(minPos: Int, maxPos: Int, n: Int = 10): Seq[(Int, Int)] = {
    val width = math.max(1, (maxPos - minPos + 1) / n)
    (minPos to maxPos by width).map(p => (p, math.min(p + width - 1, maxPos)))
  }

  /** @param long       long form (read_id, position, base, qual)
    * @param bins       inclusive position ranges
    */
  def apply(
      long: DataFrame,
      bins: Seq[(Int, Int)],
      excludeNullQuality: Boolean = true,
      percentiles: Seq[Double] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val spark = long.sparkSession
    import spark.implicits._
    val binsDf = broadcast(
      bins.map { case (a, b) => (s"$a-$b", a, b) }
        .toDF("bin_label", "bin_start", "bin_end"))
    val base = if (excludeNullQuality) long.filter(col("qual") > 0) else long
    val pctExprs = percentiles.map(p =>
      percentile_approx(col("qual"), lit(p / 100.0), lit(10000))
        .as(s"p${p.toInt}"))
    base
      .join(binsDf, col("position").between(col("bin_start"), col("bin_end")))
      .groupBy(col("bin_label"), col("bin_start"), col("bin_end"))
      .agg(
        count(lit(1)).as("n"),
        Seq(
          avg(col("qual")).as("mean"),
          percentile_approx(col("qual"), lit(0.5), lit(10000)).as("median"),
          min(col("qual")).as("min"),
          max(col("qual")).as("max")) ++ pctExprs: _*)
      .orderBy(col("bin_start"))
  }
}
