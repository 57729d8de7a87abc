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

    override def finish(regs: Array[Byte]): Double = hllEstimate(regs)

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Standard HLL estimator over a register array (m = regs.length). */
  private[ops] def hllEstimate(regs: Array[Byte]): Double = {
    val m = regs.length
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

  /** [[HllAggregator]] that RETURNS the register array instead of the
    * estimate — the persistable per-slice summary for roll-ups.
    */
  private[graft] class HllRegistersAggregator(p: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    private val inner = new HllAggregator(p)
    override def zero: Array[Byte] = inner.zero
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = inner.reduce(b, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Second-level merge of stored register arrays (element-wise max),
    * finishing to the estimate. Because max-merge is associative and
    * commutative, a roll-up over ANY partitioning of the data (days,
    * shards, years) finishes to the BIT-IDENTICAL estimate the direct
    * one-pass sketch produces — that equality is the gate contract.
    *
    * The register count m (= 2^p) is DERIVED from the stored arrays, not
    * configured: summaries are a persisted cross-session format, and a
    * mis-supplied p would either crash mid-merge or silently merge a
    * prefix of the registers. Mixing summaries of different p in one
    * group is a hard error (the sketches are not mergeable).
    */
  private[graft] class HllMergeAggregator
      extends Aggregator[Array[Byte], Array[Byte], Double] {
    override def zero: Array[Byte] = Array.emptyByteArray
    // clone on first adoption: the buffer must own its registers, not
    // alias an input row's array
    override def reduce(b: Array[Byte], regs: Array[Byte]): Array[Byte] =
      if (b.isEmpty) regs.clone() else merge(b, regs)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length,
          s"cannot merge HLL summaries of different p: 2^p register counts ${a.length} vs ${b.length}")
        var i = 0
        while (i < a.length) {
          if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
          i += 1
        }
        a
      }
    override def finish(b: Array[Byte]): Double =
      if (b.isEmpty) 0.0 else hllEstimate(b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Pre-aggregated distinct-count summaries: one register array per
    * (sliceCols) group — the thing a 100 TB pipeline PERSISTS per
    * day/shard so totals never rescan raw data.
    */
  def hllSummaries(df: DataFrame, sliceCols: Seq[String], valueCol: String,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4, 18], got $p")
    val agg = udaf(new HllRegistersAggregator(p))
    df.groupBy(sliceCols.map(col): _*)
      .agg(agg(xxhash64(col(valueCol))).as("hll_regs"))
  }

  /** Roll stored summaries up to `finalCols` granularity: merges the
    * register arrays (element-wise max — no raw data touched) and
    * finishes to `hll_estimate`, bit-identical to the direct sketch.
    * p is read off the stored arrays themselves — no parameter to
    * mis-supply against a persisted format.
    */
  def hllRollup(summaries: DataFrame, finalCols: Seq[String]): DataFrame = {
    val agg = udaf(new HllMergeAggregator)
    summaries.groupBy(finalCols.map(col): _*)
      .agg(agg(col("hll_regs")).as("hll_estimate"))
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

  // ---- Count-Min frequency sketching ---------------------------------

  /** Row-`row` probe index for a 64-bit hash: Kirsch-Mitzenmacher double
    * hashing, (h1 + row·h2) mod width with h2 forced odd — `depth`
    * pairwise-distinct hash functions from ONE xxhash64 evaluation.
    */
  private[ops] def cmIndex(hash: Long, row: Int, width: Int): Int = {
    val h1 = hash & 0xffffffffL
    val h2 = (hash >>> 32) | 1L
    java.lang.Math.floorMod(h1 + row.toLong * h2, width.toLong).toInt
  }

  /** Point estimate = min over the depth probed counters; never below
    * the true weight (every row only ever ADDS collisions on top of it).
    */
  private[ops] def cmEstimate(sketch: Array[Long], depth: Int, width: Int,
      hash: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = sketch(i * width + cmIndex(hash, i, width))
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Count-Min sketch over (hash, weight) rows: depth×width Long
    * counters flattened row-major. `reduce` and `merge` are pure
    * element-wise adds — fully mergeable and commutative, so the final
    * state is a deterministic function of the input MULTISET (reruns
    * and re-partitionings agree bit-for-bit). Overestimate per probe is
    * ≤ e·W/width with probability 1−e^−depth (Cormode & Muthukrishnan,
    * J. Algorithms 2005).
    */
  private[graft] class CountMinAggregator(depth: Int, width: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], row: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < depth) {
        b(i * width + cmIndex(row._1, i, width)) += row._2
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Count-Min probe of token frequencies in `textCol`: one row per
    * probe token — (token, cnt, cm_ok) where `cnt` is the EXACT count
    * and `cm_ok` asserts the sketch contract (estimate ≥ cnt, and over
    * by ≤ ⌈e·W/width⌉). The sketch pass is ONE aggregate with map-side
    * combine and a fixed depth·width·8-byte state per task regardless
    * of vocabulary size — at 100 TB the shuffle carries one ≤64 KiB
    * array per task, never the tokens. The exact recount shuffles only
    * the ≤|probes| candidate tokens. Spark's own `xxhash64` feeds the
    * double hashing for BOTH the sketch and the probes (evaluated
    * in-plan, so driver and executors can never disagree on the hash).
    */
  def countMinProbe(df: DataFrame, idCol: String, textCol: String,
      probes: Seq[String], depth: Int = 4, width: Int = 2048): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth x $width")
    require(probes.nonEmpty, "need at least one probe token")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = Vocabulary.docTermFrequencies(df, idCol, textCol)
    val agg = udaf(new CountMinAggregator(depth, width))
    val skRow = tf.agg(
      agg(xxhash64(col("token")), col("tf").cast("long")).as("cm"),
      coalesce(sum(col("tf")), lit(0L)).cast("long").as("w")).collect()(0)
    val sketch = skRow.getSeq[Long](0).toArray
    val bound = math.ceil(math.E * skRow.getLong(1) / width).toLong
    val hashes = probes.toDF("token")
      .withColumn("h", xxhash64(col("token")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = probes.map(t => (t, cmEstimate(sketch, depth, width, hashes(t))))
      .toDF("token", "cm_est")
    val exact = tf.filter(col("token").isInCollection(probes))
      .groupBy(col("token")).agg(sum(col("tf")).cast("long").as("cnt"))
    est.join(exact, Seq("token"), "left")
      .select(col("token"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        (col("cm_est") >= coalesce(col("cnt"), lit(0L)) &&
          col("cm_est") - coalesce(col("cnt"), lit(0L)) <= bound).as("cm_ok"))
      .orderBy(col("token"))
  }

  // ---- MinHash set-overlap estimation --------------------------------

  /** Per-group MinHash SET signature over pre-hashed 64-bit elements:
    * component i tracks the minimum of splitmix64(h ^ seed_i) over all
    * elements. `reduce`/`merge` are element-wise mins — mergeable,
    * commutative, and duplicate-insensitive (it sketches the SET, so
    * the token multiset never needs a distinct pass first). The
    * matching-component fraction between two group signatures is the
    * classic unbiased Jaccard estimator, std err √(J(1−J)/k)
    * (Broder, "On the resemblance and containment of documents", 1997).
    */
  private[graft] class MinHashSetAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val v = HashKernels.mix(h ^ (i.toLong * 0x9e3779b97f4a7c15L))
        if (v < b(i)) b(i) = v
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Pairwise token-set overlap between groups of `groupCol` (e.g.
    * corpus sources): (source_a, source_b, j_exact, mh_ok) for every
    * unordered pair, where `j_exact` is the EXACT Jaccard of the two
    * distinct-token sets and `mh_ok` asserts the signature estimate is
    * within `tol` of it. At 100 TB the signature side is the product:
    * per-group state is k longs REGARDLESS of corpus size, one
    * map-side-combined aggregate, pairs compared driver-side over
    * |groups| signatures — no token-level join anywhere. The exact
    * side (distinct + self-join on token) exists to GATE the sketch
    * and is itself bounded by vocabulary, not corpus, size. The
    * estimator is deterministic (fixed seeds, min-merge), so `mh_ok`
    * either always holds on this data or fails self-explanatorily.
    */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 256, tol: Double = 0.1): DataFrame = {
    require(k >= 16, s"need k >= 16 signature components, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = Vocabulary.docTermFrequencies(df, groupCol, textCol)
      .select(col(groupCol).as("g"), col("token"))
    val agg = udaf(new MinHashSetAggregator(k))
    val sigs = tf.groupBy(col("g"))
      .agg(agg(xxhash64(col("token"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    // Pair orientation must match the exact side's Spark `<` (UTF-8
    // binary = code-point order). Scala's default String sort is UTF-16
    // code-unit order, which flips supplementary-plane names against
    // [U+E000, U+FFFF] — so sort by UTF-8 bytes explicitly.
    val utf8Order: Ordering[String] = Ordering.fromLessThan { (a, b) =>
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var r = 0
      while (r == 0 && i < math.min(x.length, y.length)) {
        r = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (r != 0) r < 0 else x.length < y.length
    }
    val est = sigs.keys.toSeq.sorted(utf8Order).combinations(2).map { case Seq(a, b) =>
      val (sa, sb) = (sigs(a), sigs(b))
      var m = 0
      var i = 0
      while (i < k) { if (sa(i) == sb(i)) m += 1; i += 1 }
      (a, b, m.toDouble / k)
    }.toSeq.toDF("source_a", "source_b", "j_est")
    val sets = tf.distinct()
    val sizes = sets.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = sets.as("a")
      .join(sets.as("b"),
        col("a.token") === col("b.token") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    est.join(inter, Seq("source_a", "source_b"), "left")
      .join(sizes.withColumnRenamed("g", "source_a")
        .withColumnRenamed("n", "n_a"), Seq("source_a"))
      .join(sizes.withColumnRenamed("g", "source_b")
        .withColumnRenamed("n", "n_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))), 6)
          .as("j_exact"),
        (abs(col("j_est") -
          coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))))
          <= tol).as("mh_ok"))
      .orderBy(col("source_a"), col("source_b"))
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
