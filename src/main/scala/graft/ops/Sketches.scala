package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketching: EXACT heavy hitters at corpus scale via the
  * two-pass Misra-Gries scheme.
  *
  * A plain `groupBy(token).count()` shuffles the whole vocabulary; fine
  * for counts, but when the question is only "which tokens exceed `1/k`
  * of the corpus" (boilerplate detection, stop-word discovery, skew-key
  * discovery for salting) the answer has at most `k-1` members and the
  * full shuffle is waste. Pass 1 runs a bounded Misra-Gries summary (k
  * counters) as ONE aggregate with map-side combine — each task's state
  * is ≤ k entries regardless of input size, and the merged summary is a
  * guaranteed SUPERSET of every true heavy hitter (undercount after
  * summing/merging is < W/(k+1) ≤ W/k, so a token with true weight
  * > W/k cannot hit zero; Agarwal et al., "Mergeable Summaries", PODS
  * 2012). Pass 2 broadcast-filters the stream to those ≤ k candidates
  * and recounts them exactly — the shuffle now carries only candidate
  * tokens. Output is exactly the true heavy hitters with exact counts.
  */
object Sketches {

  /** Merge-reduce a weighted Misra-Gries summary down to ≤ k entries:
    * subtract the (k+1)-th largest count from everything, drop ≤ 0.
    */
  private[ops] def trim(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val d = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.flatMap { case (t, c) => if (c - d > 0) Some(t -> (c - d)) else None }
    }

  /** Weighted Misra-Gries over (token, weight) rows with k counters. */
  private[ops] class MisraGriesAggregator(k: Int)
      extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], row: (String, Long)): Map[String, Long] =
      trim(b + (row._1 -> (b.getOrElse(row._1, 0L) + row._2)), k)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      trim(b.foldLeft(a) { case (acc, (t, c)) =>
        acc + (t -> (acc.getOrElse(t, 0L) + c))
      }, k)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Misra-Gries candidate set over a (token, weight) frame: every token
    * with true total weight > totalWeight/k is guaranteed present.
    */
  def mgCandidates(weighted: DataFrame, tokenCol: String, weightCol: String,
      k: Int): Array[String] = {
    require(k >= 2, s"k must be >= 2, got $k")
    val agg = udaf(new MisraGriesAggregator(k))
    weighted
      .agg(agg(col(tokenCol), col(weightCol).cast("long")).as("mg"))
      .select(explode(map_keys(col("mg"))).as("token"))
      .collect().map(_.getString(0))
  }

  // ---- HyperLogLog distinct counting ---------------------------------

  /** HyperLogLog with 2^p registers over pre-hashed 64-bit values.
    * The register array is a pure max-merge — order- and
    * partition-invariant, so the estimate is a deterministic function of
    * the SET of inputs (reruns and re-partitionings agree bit-for-bit).
    * Standard estimator with the small-range linear-counting correction
    * (Flajolet et al. 2007); typical relative error ≈ 1.04/√(2^p).
    */
  private[ops] class HllAggregator(p: Int)
      extends Aggregator[Long, Array[Byte], Double] {
    private val m = 1 << p

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
      val idx = (hash >>> (64 - p)).toInt
      // rank = leading zeros of the remaining 64-p bits, +1; capped there
      val rest = hash << p
      val rank = (if (rest == 0L) (64 - p) else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
      regs
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(regs: Array[Byte]): Double = {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / m)
      }
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        val r = regs(i) & 0xff
        invSum += 1.0 / (1L << r)
        if (r == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / invSum
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group approximate distinct count of `valueCol`: (groupCols...,
    * hll_estimate DOUBLE). One map-side-combined aggregate whose state is
    * a fixed 2^p bytes per group REGARDLESS of cardinality — the shuffle
    * carries one register array per (task, group), never the values.
    * `xxhash64` feeds the sketch, so any value type works.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4, 18], got $p")
    val agg = udaf(new HllAggregator(p))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(xxhash64(col(valueCol))).as("hll_estimate"))
  }

  /** Exact tokens with frequency strictly greater than 1/k of all token
    * occurrences in `textCol` ([[HashKernels.tokensOf]] tokenization).
    * Output: (token, cnt, share=round(cnt/W, 6)), by cnt desc / token.
    *
    * Plan shape: pass 1 = per-doc term-freq kernel into the bounded MG
    * aggregate (map-side combined, ≤ k rows per task into one reduce);
    * pass 2 = the same kernel frame filtered to the broadcast candidate
    * set (≤ k tokens) into an exact count. Neither pass shuffles the
    * full vocabulary.
    */
  def heavyHitters(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = Vocabulary.docTermFrequencies(df, idCol, textCol)
    val candidates = mgCandidates(tf, "token", "tf", k)
    val total = tf.agg(coalesce(sum(col("tf")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    tf.filter(col("token").isInCollection(candidates))
      .groupBy(col("token"))
      .agg(sum(col("tf")).cast("long").as("cnt"))
      .filter(col("cnt") * k > total)
      .withColumn("share", round(col("cnt").cast("double") / total, 6))
      .orderBy(col("cnt").desc, col("token"))
  }
}
