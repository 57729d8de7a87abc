package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-position distribution / information-content operators over the long
  * form (read_id, position, base, qual).
  *
  * All of these are a single hash aggregate keyed by (position, base) —
  * partial aggregation happens map-side, and the shuffled key cardinality is
  * |window| × |alphabet| regardless of read count, so the same plan holds at
  * 100 TB. Output stays in long (position, base, …) layout; pivoting to the
  * reference's wide matrix is a presentation step (`pivotWide`).
  *
  * Skew note (SURVEY §4.2's flagged pathology — narrow window, extreme read
  * count): no salting is needed here BECAUSE every aggregate in the family
  * is combinable (count/sum/max_by over counts) — partial aggregation is
  * the salt. Each map task ships at most one partial row per (position,
  * base), so shuffle volume is #mapPartitions × keys, independent of read
  * count; the reduce side merges partials, never raw rows
  * (SkewStressSpec pins this with task shuffle-read metrics). Salting
  * would only matter for a NON-combinable per-position aggregate (exact
  * per-position distinct over an unbounded value domain, or a raw
  * collect) — none exists in this family; add the two-level
  * groupBy(position, base, pmod(xxhash64(read_id), S)) pre-aggregate if
  * one is ever introduced. Reducer parallelism floors at the key count
  * (a 1-position window uses |alphabet| reduce slots), which caps the
  * reduce stage at keys × (per-key merge of #mapPartitions partial
  * longs) — microseconds even at 10^6 map tasks.
  */
object Distributions {

  /** A1 `get_seq_dist` (ref: seqtables.py:882-934, numpy_ops.py:107-134).
    * Per-position letter counts, optionally weighted per read.
    * Output: (position, base, cnt) — cnt is DOUBLE when weighted.
    */
  def seqDist(
      long: DataFrame,
      ignoreChars: Seq[Char] = Nil,
      weights: Option[DataFrame] = None): DataFrame = {
    val filtered =
      if (ignoreChars.isEmpty) long
      else long.filter(!col("base").isin(ignoreChars.map(_.toString): _*))
    weights match {
      case None =>
        filtered.groupBy(col("position"), col("base"))
          .agg(count(lit(1)).as("cnt"))
      case Some(w) =>
        filtered.join(broadcast(w), Seq("read_id"))
          .groupBy(col("position"), col("base"))
          .agg(sum(col("weight")).as("cnt"))
    }
  }

  /** A1 `method='freq'`: column-normalized frequencies.
    * Output: (position, base, freq).
    */
  def seqFreq(long: DataFrame, ignoreChars: Seq[Char] = Nil): DataFrame = {
    val counts = seqDist(long, ignoreChars)
    val w = Window.partitionBy(col("position"))
    counts
      .withColumn("freq", col("cnt") / sum(col("cnt")).over(w))
      .drop("cnt")
  }

  /** A3 `get_consensus` (ref: seqtables.py:1512-1553): per-position modal
    * letter; fill letter where the mode's share is ≤ modeCutoff.
    * Ties break deterministically by (count desc, base asc).
    * Output: (position, base).
    */
  def consensus(
      long: DataFrame,
      modeCutoff: Double = 0.0,
      fill: Char = 'N',
      ignoreChars: Seq[Char] = Nil): DataFrame = {
    val counts = seqDist(long, ignoreChars)
    val w = Window.partitionBy(col("position"))
      .orderBy(col("cnt").desc, col("base"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("position"))))
      .filter(col("rn") === 1)
      .select(
        col("position"),
        when(col("cnt") <= col("total") * lit(modeCutoff), lit(fill.toString))
          .otherwise(col("base")).as("base"))
  }

  /** Assemble the consensus string on the driver (window-sized, tiny). */
  def consensusString(long: DataFrame, modeCutoff: Double = 0.0, fill: Char = 'N'): String =
    consensus(long, modeCutoff, fill)
      .orderBy(col("position"))
      .collect().map(_.getString(1)).mkString

  /** A7 per-position Shannon entropy −Σ p log_b p
    * (ref: seq_logo.py:314-318, seqtables.py:1315-1317).
    * Output: (position, entropy).
    */
  def entropy(long: DataFrame, logBase: Double = 2.0, ignoreChars: Seq[Char] = Nil): DataFrame =
    seqFreq(long, ignoreChars)
      .groupBy(col("position"))
      .agg((-sum(col("freq") * log(col("freq")) / lit(math.log(logBase))))
        .as("entropy"))

  /** A6 `get_bits` (ref: seq_logo.py:297-311): per-position information
    * content log2|A| − (H + e_n/2), small-sample correction
    * e_n = (|A|−1) / (2 N ln 2), clamped at 0.
    * Output: (position, bits).
    */
  def bits(long: DataFrame, alphabetSize: Int = 4, ignoreChars: Seq[Char] = Nil): DataFrame = {
    val h = entropy(long, 2.0, ignoreChars)
    val n = seqDist(long, ignoreChars)
      .groupBy(col("position")).agg(sum(col("cnt")).as("n"))
    h.join(n, Seq("position"))
      .select(
        col("position"),
        greatest(lit(0.0),
          lit(math.log(alphabetSize) / math.log(2.0)) -
            (col("entropy") + (lit(alphabetSize - 1) / (lit(2.0 * math.log(2.0)) * col("n")))))
          .as("bits"))
  }

  /** A8 relative entropy vs a background distribution
    * (ref: seq_logo.py:321-329). Background defaults to uniform 1/|A|.
    * Output: (position, rel_entropy).
    */
  def relativeEntropy(
      long: DataFrame,
      background: Option[DataFrame] = None, // (base, bg_freq) or (position, base, bg_freq)
      alphabetSize: Int = 4,
      ignoreChars: Seq[Char] = Nil): DataFrame = {
    val fg = seqFreq(long, ignoreChars)
    val joined = background match {
      case None => fg.withColumn("bg_freq", lit(1.0 / alphabetSize))
      case Some(bg) =>
        val keys = if (bg.columns.contains("position")) Seq("position", "base") else Seq("base")
        fg.join(broadcast(bg), keys)
    }
    joined.groupBy(col("position"))
      .agg(sum(col("freq") * log(2.0, col("freq") / col("bg_freq")))
        .as("rel_entropy"))
  }

  /** A9 `get_plogo` (ref: seq_logo.py:332-456; O'Shea 2013): per
    * (position, base) binomial log-odds
    * −(log sf(k−1; N, p) − log cdf(k; N, p)) · log10(e).
    * Computed with commons-math3's regularized incomplete beta (ships with
    * Spark). The counts matrix is |window|×|A| — tiny — so the scalar UDF
    * runs on an already-aggregated frame.
    * Output: (position, base, plogo).
    */
  def plogo(
      long: DataFrame,
      backgroundFreq: Double = 0.25,
      ignoreChars: Seq[Char] = Nil): DataFrame = {
    val counts = seqDist(long, ignoreChars)
    val withN = counts.withColumn("n",
      sum(col("cnt")).over(Window.partitionBy(col("position"))))
    val f = udf { (k: Long, n: Long) => plogoStat(k, n, backgroundFreq) }
    withN.select(col("position"), col("base"),
      f(col("cnt"), col("n")).as("plogo"))
  }

  /** log10-odds of observing ≥k vs ≤k successes in n Bernoulli(p) draws. */
  private[ops] def plogoStat(k: Long, n: Long, p: Double): Double = {
    import org.apache.commons.math3.distribution.BinomialDistribution
    val dist = new BinomialDistribution(n.toInt, p)
    val logSf = math.log(math.max(1e-300, 1.0 - dist.cumulativeProbability(k.toInt - 1)))
    val logCdf = math.log(math.max(1e-300, dist.cumulativeProbability(k.toInt)))
    -(logSf - logCdf) / math.log(10.0)
  }

  /** Reference-style wide matrix: rows = base, columns = positions. Only for
    * small windows / presentation — the pivot is a second shuffle.
    */
  def pivotWide(dist: DataFrame, valueCol: String = "cnt"): DataFrame =
    dist.groupBy(col("base"))
      .pivot("position")
      .agg(first(col(valueCol)))
}
