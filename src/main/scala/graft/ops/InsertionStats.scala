package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5: aggregates over the insertion side-table
  * (read_id, position, loc, base, qual) — SURVEY §2.5.
  * All are single hash aggregates keyed by position (tiny key space).
  */
object InsertionStats {

  /** `get_insertion_seq_dist` (ref: seqtables.py:1036-1053): letter
    * distribution per (position, loc); `minInsCount` drops rare slots by the
    * number of distinct reads carrying them.
    * Output: (position, loc, base, cnt).
    */
  def seqDist(ins: DataFrame, minInsCount: Long = 0): DataFrame = {
    val counts = ins.groupBy(col("position"), col("loc"), col("base"))
      .agg(count(lit(1)).as("cnt"))
    if (minInsCount <= 0) counts
    else {
      val keep = ins.groupBy(col("position"), col("loc"))
        .agg(countDistinct(col("read_id")).as("n_reads"))
        .filter(col("n_reads") >= minInsCount)
        .select("position", "loc")
      counts.join(broadcast(keep), Seq("position", "loc"), "left_semi")
    }
  }

  /** `get_insertion_events` (ref: seqtables.py:1403-1420): number of reads
    * with ≥1 insertion at each position, above a quality floor.
    * Output: (position, n_reads).
    */
  def events(ins: DataFrame, minQuality: Int = 0): DataFrame =
    ins.filter(col("qual") >= minQuality)
      .groupBy(col("position"))
      .agg(countDistinct(col("read_id")).as("n_reads"))

  /** `get_insertion_distribution` (ref: seqtables.py:1422-1435): counts per
    * (position, loc). Output: (position, loc, cnt).
    */
  def distribution(ins: DataFrame): DataFrame =
    ins.groupBy(col("position"), col("loc")).agg(count(lit(1)).as("cnt"))

  /** `get_average_insertion_quality` (ref: seqtables.py:1437-1450).
    * Output: (position, loc, avg_qual).
    */
  def averageQuality(ins: DataFrame): DataFrame =
    ins.groupBy(col("position"), col("loc")).agg(avg(col("qual")).as("avg_qual"))

  /** `get_insertion_expectations` (ref: seqtables.py:1452-1485): per
    * position, mean / max insertion length across reads that have an
    * insertion there. Max length = -min(loc) because locs are negative
    * (ref :1472); per-read length = count of inserted bases.
    * Output: (position, mean_len, max_len, median_len).
    */
  def expectations(ins: DataFrame): DataFrame =
    ins.groupBy(col("position"), col("read_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("position"))
      .agg(
        avg(col("len")).as("mean_len"),
        max(col("len")).as("max_len"),
        percentile_approx(col("len"), lit(0.5), lit(10000)).as("median_len"))
}
