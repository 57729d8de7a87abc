package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A4 `get_substrings` (ref: seqtables.py:936-1034): k-mer counting, both
  * contiguous and gapped (arbitrary position combinations).
  *
  * The C(P,k) combination space is generated driver-side and exploded as a
  * literal array (it must be bounded anyway — the reference's docs warn
  * about the blow-up; `combinations` enforces a cap and reports what was
  * dropped so callers can log it, SURVEY §7.4.5). Per read the work is a
  * pure projection; the aggregate is keyed by (combo, kmer) — partial
  * map-side combine keeps the shuffle proportional to distinct k-mers, not
  * reads.
  */
object Kmers {

  /** Contiguous k-mers at every start position of the window.
    * Output: (start_position, kmer, cnt).
    */
  def contiguous(reads: DataFrame, k: Int, minPos: Int): DataFrame =
    reads
      .filter(length(col("seq")) >= k)
      .select(posexplode(
        transform(
          sequence(lit(1), length(col("seq")) - lit(k) + lit(1)),
          i => array_join(slice(split(col("seq"), ""), i, lit(k)), ""))))
      .select((col("pos") + lit(minPos)).as("start_position"), col("col").as("kmer"))
      .groupBy(col("start_position"), col("kmer"))
      .agg(count(lit(1)).as("cnt"))

  /** Gapped k-mers over explicit position combinations (reference
    * coordinates, ascending). Output: (combo "p1,p2,..", kmer, cnt) — cnt is
    * DOUBLE when weighted, matching A1's weighting contract.
    */
  def gapped(
      reads: DataFrame,
      combos: Seq[Seq[Int]],
      minPos: Int,
      weights: Option[DataFrame] = None): DataFrame = {
    require(combos.nonEmpty, "no position combinations given")
    val exploded = reads.select(
      col("read_id"),
      split(col("seq"), "").as("chars"),
      explode(lit(combos.map(_.toArray).toArray)).as("combo"))
    val kmer = concat_ws("",
      transform(col("combo"), p => element_at(col("chars"), (p - lit(minPos) + lit(1)).cast("int"))))
    val projected = exploded.select(
      col("read_id"),
      array_join(col("combo"), ",").as("combo"),
      kmer.as("kmer"))
    weights match {
      case None =>
        projected.groupBy(col("combo"), col("kmer")).agg(count(lit(1)).as("cnt"))
      case Some(w) =>
        projected.join(broadcast(w), Seq("read_id"))
          .groupBy(col("combo"), col("kmer")).agg(sum(col("weight")).as("cnt"))
    }
  }

  /** All C(positions, k) combinations with a hard cap; returns (kept,
    * droppedCount) so callers can log dropped coverage.
    */
  def combinations(positions: Seq[Int], k: Int, maxCombos: Int = 5000): (Seq[Seq[Int]], Long) = {
    val kept = positions.combinations(k).take(maxCombos).toSeq
    val total = binomial(positions.size, k)
    (kept, math.max(0L, total - kept.size))
  }

  private def binomial(n: Int, k: Int): Long = {
    if (k < 0 || k > n) return 0L
    var r = 1L
    for (i <- 1 to k) r = r * (n - k + i) / i
    r
  }
}
