package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for approximate nearest-neighbor search (Jégou,
  * Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
  * Search"): vectors are L2-normalized, split into `m` subvectors, and
  * each subvector is replaced by the id of its nearest subspace centroid
  * — a d-dim float vector compresses to `m` small codes (m bytes at
  * ksub ≤ 256). Search uses Asymmetric Distance Computation: the query
  * stays exact, each subspace contributes a looked-up partial inner
  * product, so scanning a candidate costs m table lookups instead of d
  * multiplies and the corpus resident set shrinks ~d·4/m-fold — THE
  * memory-bound scale path when 100 TB of embeddings must be scanned.
  *
  * Scale shape: training samples ≤ `sampleN` vectors to the driver
  * (hash-ordered, deterministic — same contract as
  * [[Similarity.trainCentroids]]); encoding is map-only; the ADC scan is
  * map-only with the per-query lookup tables broadcast (nq·m·ksub floats
  * — KBs); selection is the bounded-heap [[TopKAggregator]]; the
  * optional exact re-rank touches only the ADC top `k·rerankFactor`
  * candidates per query. No corpus shuffle anywhere.
  *
  * Normalized vectors make the subspace metric L2-on-units, so ADC inner
  * product ≈ cosine and results rank on the same scale as the rest of
  * the ANN family.
  */
object ProductQuantizer {

  /** Trained codebooks: `cents(j)(c)` is centroid `c` of subspace `j`
    * (dsub floats each). Zero-norm input vectors encode to centroid 0.
    */
  final case class Codebooks(dim: Int, m: Int, ksub: Int,
      cents: Array[Array[Array[Float]]]) {
    def dsub: Int = dim / m
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(HashKernels.dotD(v, v))
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  private def sliceSub(v: Array[Float], j: Int, dsub: Int): Array[Float] =
    java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Deterministic per-subspace k-means (k-means++ seeding from a fixed
    * seed over a hash-ordered sample, like the IVF trainer, then Lloyd
    * iterations under L2 on the normalized subvectors).
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 64,
      lloydIters: Int = 5,
      sampleN: Int = 4096): Codebooks = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    require(ksub >= 2 && ksub <= 256, s"ksub must be in [2, 256], got $ksub")
    val sample: Array[Array[Float]] = corpus
      .select(col(vecCol), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
      .filter(v => HashKernels.dotD(v, v) > 0)
    require(sample.nonEmpty, "ProductQuantizer.train: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide the dimension $dim")
    val dsub = dim / m
    val unit = sample.map(normalize)

    val cents = Array.tabulate(m) { j =>
      val subs = unit.map(sliceSub(_, j, dsub))
      // k-means++ seeding, deterministic per subspace
      val rnd = new scala.util.Random(42L + j)
      val picked = scala.collection.mutable.ArrayBuffer(subs(0))
      // minD already holds SQUARED L2 distances (l2sq), so it IS the
      // k-means++ D² weight — unlike Similarity.trainCentroids, whose
      // minD holds plain (1 − cos) distances and must square. Squaring
      // again here would sample ∝ D⁴ and overweight outliers.
      val minD = subs.map(l2sq(_, subs(0)))
      while (picked.length < math.min(ksub, subs.length) && minD.exists(_ > 0)) {
        val w = minD
        var target = rnd.nextDouble() * w.sum
        var i = 0
        while (i < w.length - 1 && target >= w(i)) { target -= w(i); i += 1 }
        if (w(i) == 0.0) i = minD.indices.maxBy(minD)
        picked += subs(i)
        var p = 0
        while (p < subs.length) {
          val d = l2sq(subs(p), subs(i))
          if (d < minD(p)) minD(p) = d
          p += 1
        }
      }
      var cs = picked.toArray
      // Lloyd under L2; empty cells keep their previous centroid
      var it = 0
      while (it < lloydIters) {
        val sums = Array.fill(cs.length)(new Array[Double](dsub))
        val counts = new Array[Int](cs.length)
        subs.foreach { s =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            val d = l2sq(s, cs(c)); if (d < bd) { bd = d; best = c }; c += 1
          }
          counts(best) += 1
          var q = 0
          while (q < dsub) { sums(best)(q) += s(q); q += 1 }
        }
        cs = cs.indices.map { c =>
          if (counts(c) == 0) cs(c)
          else Array.tabulate(dsub)(q => (sums(c)(q) / counts(c)).toFloat)
        }.toArray
        it += 1
      }
      cs
    }
    Codebooks(dim, m, ksub, cents)
  }

  /** Nearest subspace centroid ids of one (normalized) vector. */
  def encodeVec(v0: Array[Float], cb: Codebooks): Array[Int] = {
    val v = normalize(v0)
    Array.tabulate(cb.m) { j =>
      val s = sliceSub(v, j, cb.dsub)
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < cb.cents(j).length) {
        val d = l2sq(s, cb.cents(j)(c)); if (d < bd) { bd = d; best = c }; c += 1
      }
      best
    }
  }

  /** (idCol, codes ARRAY<INT> of length m) — map-only. */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame = {
    val f = udf((v: Array[Float]) => encodeVec(v, cb))
    df.select(col(idCol), f(col(vecCol)).as("codes"))
  }

  /** Top-k ANN via ADC over PQ codes, exact re-rank of the ADC shortlist.
    * Output (query_id, neighbor_id, sim, rank) — sim is the EXACT cosine
    * of re-ranked candidates (rounded to 6 dp like the other ANN paths),
    * rank by (sim desc, id asc). Self-matches are excluded.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      m: Int = 8,
      ksub: Int = 64,
      lloydIters: Int = 5,
      rerankFactor: Int = 4,
      codebooks: Option[Codebooks] = None): DataFrame = {
    require(k >= 1 && rerankFactor >= 1)
    // a caller that already trained (to stash the model for the oracle)
    // passes it in — training is deterministic, so this is purely a
    // recompute saver, the ivfTopK `centroids=` convention
    val cb = codebooks.getOrElse(train(corpus, idCol, vecCol, m, ksub, lloydIters))
    val encoded = encode(corpus, idCol, vecCol, cb)
      .withColumnRenamed(idCol, "neighbor_id")

    // per-query subspace lookup tables: lut(q)(j)(c) = <query_sub_j, cent_c>
    val qVecs: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qVecs.nonEmpty, "pqTopK: empty query set")
    val qIds = qVecs.map(_._1)
    val luts: Array[Array[Array[Double]]] = qVecs.map { case (_, qv) =>
      val qn = normalize(qv)
      Array.tabulate(cb.m) { j =>
        val s = sliceSub(qn, j, cb.dsub)
        cb.cents(j).map(c => HashKernels.dotD(s, c))
      }
    }

    // ADC scan: one pass over codes, all queries at once (lookup tables
    // ride the closure — broadcast by Spark's task serialization)
    val adc = udf((codes: Array[Int]) =>
      luts.map { lut =>
        var s = 0.0
        var j = 0
        while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
        s
      })
    val shortlist = TopKAggregator.topKByGroup(
      encoded.select(col("neighbor_id"), posexplode(adc(col("codes"))))
        .select(element_at(lit(qIds), col("pos") + 1).as("query_id"),
          col("neighbor_id"), col("col").as("adc_sim"))
        .filter(col("query_id") =!= col("neighbor_id")),
      "query_id", "neighbor_id", "adc_sim", k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank of the shortlist (narrow: nq * k * rerankFactor rows)
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val scored = shortlist
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(call_function("cosine_f", col("qv"), col("cv")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }
}
