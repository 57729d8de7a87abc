package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the "quality/domain
  * classifier" step of a training-data pipeline (GPT-3 and PaLM filter
  * web crawl with a linear classifier scored against a high-quality
  * target corpus; fastText's supervised mode is the standard tool).
  * Naive Bayes is the aggregation-friendly member of that family: the
  * whole model IS one `(label, token) → count` aggregate, so training
  * is a single map-side-combined groupBy bounded by |vocab| × |labels|
  * — no gradient loop, no driver iteration, deterministic.
  *
  * Scoring is map-only: the model broadcasts inside the kernel closure
  * and each document computes add-one-smoothed negative log-likelihoods
  * `nll(l) = -ln P(l) - Σ_tok ln((c(l,tok)+1)/(total_l+|V|))`, predicting
  * the argmin. Like [[LanguageModel]], every term is quantized to 1e-9
  * (half-up) and accumulated as a Long, so sums are exact integer
  * addition — order-insensitive, and the DuckDB oracle lands on the
  * identical DECIMAL(38,9) values. Ties (exact equal quantized nll)
  * break to the lexicographically smallest label; unseen tokens take the
  * per-label smoothing floor, so scoring a frame disjoint from the
  * training frame is well-defined.
  *
  * 100 TB audit: train = one shuffle keyed by (label, token) with
  * partial aggregation (the vocabulary plateaus, not the corpus) + two
  * scalar-sized aggregates (priors, |V|); score = zero shuffles.
  */
object Classifier {

  /** Per-label stats: ln-prior and smoothing denominator total.
    * `termNanos(token)(labelIdx)` = quantized −ln((c+1)/(total_l+|V|)).
    */
  final case class NaiveBayesModel(
      labels: Array[String],
      priorNanos: Array[Long],
      unseenNanos: Array[Long],
      termNanos: Map[String, Array[Long]]) {
    require(labels.sameElements(labels.sorted), "labels must be sorted")
  }

  private[ops] def quantize(x: Double): Long = HashKernels.nanoQuant(x)

  /** Train on `(labelCol, textCol)` rows. Three aggregates: (label,
    * token) counts [vocab-bounded], per-label doc counts [|labels|
    * rows], corpus vocabulary size [1 row]. Collected model size is
    * |vocab| × |labels| longs.
    */
  def trainNaiveBayes(
      train: DataFrame,
      labelCol: String,
      idCol: String,
      textCol: String): NaiveBayesModel = {
    val tf = Vocabulary.docTermFrequencies(
      train.select(col(idCol), col(labelCol), col(textCol)), idCol, textCol)
      .join(train.select(col(idCol), col(labelCol)), Seq(idCol))
    val counts = tf.groupBy(col(labelCol), col("token"))
      .agg(sum(col("tf")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(counts.nonEmpty, "trainNaiveBayes: empty corpus")
    val docCounts = train.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = docCounts.keys.toArray.sorted
    val idx = labels.zipWithIndex.toMap
    val vocabSize = counts.map(_._2).distinct.length.toLong
    val totals = new Array[Long](labels.length)
    counts.foreach { case (l, _, c) => totals(idx(l)) += c }
    val denom = totals.map(t => (t + vocabSize).toDouble)
    val nDocs = docCounts.values.sum.toDouble
    val priorNanos = labels.map(l => quantize(-math.log(docCounts(l) / nDocs)))
    val unseenNanos = denom.map(d => quantize(-math.log(1.0 / d)))
    val termNanos = counts.groupBy(_._2).map { case (token, rows) =>
      val arr = unseenNanos.clone()
      rows.foreach { case (l, _, c) =>
        arr(idx(l)) = quantize(-math.log((c + 1.0) / denom(idx(l))))
      }
      token -> arr
    }
    NaiveBayesModel(labels, priorNanos, unseenNanos, termNanos)
  }

  /** Map-only scoring: `(idCol, pred label, n_tokens, round(nll, 6))`
    * per document with at least one token. `nll` is the winning label's
    * total (prior + token terms) — lower = more likely.
    */
  def scoreNaiveBayes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NaiveBayesModel,
      outCol: String = "label_pred"): DataFrame = {
    val labels = model.labels
    val priors = model.priorNanos
    val unseen = model.unseenNanos
    val terms = model.termNanos
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.isEmpty) null
      else {
        val nll = priors.clone()
        var i = 0
        while (i < toks.length) {
          val arr = terms.getOrElse(toks(i), unseen)
          var l = 0
          while (l < nll.length) { nll(l) += arr(l); l += 1 }
          i += 1
        }
        var best = 0
        var l = 1
        while (l < nll.length) { if (nll(l) < nll(best)) best = l; l += 1 }
        (labels(best), toks.length, nll(best).toDouble / 1e9)
      }
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s._1").as(outCol),
        col("s._2").as("n_tokens"), round(col("s._3"), 6).as("nll"))
  }

  // ---- logistic regression (fastText-style quality classifier) --------

  /** Hashed-bag-of-words logistic regression, the gradient-trained half
    * of the web-quality-classifier family (GPT-3's quality filter is a
    * linear classifier over text features). Weights are kept QUANTIZED
    * (1e-9 Longs): per-row gradient contributions quantize before the
    * per-bucket sum, so each training step is exact integer addition —
    * partition-order-invariant and bit-reproducible across reruns.
    */
  final case class LogisticModel(
      dim: Int,
      biasNano: Long,
      weightNanos: Array[Long])

  /** Sparse hashed features of one document: (bucket, 1.0) for each
    * occupied bucket (binary presence — unit-scale features keep
    * gradients strong enough for batch GD to converge in tens of
    * passes; tf/len values at ~1/len crawl). Buckets ascending.
    * MurmurHash3 is a pure function of the token — stable across JVMs,
    * executors, and reruns.
    */
  def hashFeatures(text: String, dim: Int): Array[(Int, Double)] = {
    val toks = HashKernels.tokensOf(text)
    if (toks.isEmpty) Array.empty
    else {
      val buckets = new java.util.TreeSet[Integer]()
      var i = 0
      while (i < toks.length) {
        val h = scala.util.hashing.MurmurHash3.stringHash(toks(i), 42)
        buckets.add(((h % dim) + dim) % dim)
        i += 1
      }
      val out = new Array[(Int, Double)](buckets.size)
      val it = buckets.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = (it.next().intValue(), 1.0)
        j += 1
      }
      out
    }
  }

  /** One gradient pass as a typed aggregate: the buffer is the whole
    * (dim+1)-slot quantized-Long gradient (bias in the last slot), so a
    * task's rows fold locally and partitions merge element-wise — per
    * iteration the shuffle carries one small array per task, never
    * per-feature rows. Contributions are quantized BEFORE summing,
    * identical to the former explode+groupBy formulation, so the
    * trained model is bit-for-bit unchanged.
    */
  private[ops] class GradAggregator(dim: Int, biasNano: Long, weightNanos: Array[Long])
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, scala.collection.Seq[Int], scala.collection.Seq[Double]),
        Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](dim + 1)
    override def reduce(
        b: Array[Long],
        row: (Double, scala.collection.Seq[Int], scala.collection.Seq[Double])): Array[Long] = {
      val (y, xb, xv) = row
      var z = biasNano / 1e9
      var i = 0
      while (i < xb.length) {
        z += (weightNanos(xb(i)) / 1e9) * xv(i)
        i += 1
      }
      val r = 1.0 / (1.0 + math.exp(-z)) - y
      i = 0
      while (i < xb.length) {
        b(xb(i)) += quantize(r * xv(i))
        i += 1
      }
      b(dim) += quantize(r)
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private def margin(model: LogisticModel, feats: Array[(Int, Double)]): Double = {
    var z = model.biasNano / 1e9
    var i = 0
    while (i < feats.length) {
      z += (model.weightNanos(feats(i)._1) / 1e9) * feats(i)._2
      i += 1
    }
    z
  }

  /** Batch gradient descent, `iters` full passes at rate `lr`. Each pass
    * is ONE typed aggregate ([[GradAggregator]]): every task folds its
    * rows into a fixed (dim+1)-slot quantized-Long gradient array and
    * partitions merge element-wise, so the per-iteration shuffle is one
    * small array per task. No window, no full-vocabulary state, no
    * driver-side row loop; the cached feature frame is scanned once per
    * iteration. Labels must be 0/1.
    */
  def trainLogistic(
      train: DataFrame,
      labelCol: String,
      textCol: String,
      dim: Int = 256,
      iters: Int = 60,
      lr: Double = 1.0): LogisticModel = {
    require(dim > 0 && iters >= 0, s"bad dim=$dim / iters=$iters")
    // parallel arrays (buckets, values) rather than an array-of-struct so
    // the per-iteration UDF takes plain primitive-array inputs
    val featUdf = udf((t: String) => {
      val fa = hashFeatures(t, dim)
      (fa.map(_._1), fa.map(_._2))
    })
    val feats0 = train
      .select(col(labelCol).cast("double").as("y"), featUdf(col(textCol)).as("x"))
      .select(col("y"), col("x._1").as("xb"), col("x._2").as("xv"))
      .filter(size(col("xb")) > 0)
      .cache()
    val n = feats0.count()
    require(n > 0, "trainLogistic: no non-empty documents")
    // Right-size the frame the gradient loop iterates over: `iters`
    // sequential jobs each pay per-task overhead, so empty/near-empty
    // tasks dominate wall-clock when partitions outnumber rows (observed
    // 2x on the fixture bench). Target ~64k rows per task, never above
    // the existing layout — a corpus-scale frame keeps full parallelism,
    // and the quantized-Long gradient sums make the result layout-
    // invariant either way. coalesce (narrow) reads the cached
    // partitions without a shuffle.
    val parts = math.max(1L, math.min(feats0.rdd.getNumPartitions.toLong, n / 65536L + 1L)).toInt
    val feats = feats0.coalesce(parts)
    var model = LogisticModel(dim, 0L, new Array[Long](dim))
    var it = 0
    while (it < iters) {
      val m = model
      // one aggregate per iteration: each task folds its rows into a
      // fixed (dim+1)-long gradient array, merged element-wise — same
      // quantized-Long contributions the old explode+groupBy summed, so
      // the model is bit-identical, but the per-iteration job carries
      // one small array per task instead of a row-per-feature shuffle
      // (observed ~2x on the 60-iteration fixture bench)
      val gradAgg = udaf(new GradAggregator(dim, m.biasNano, m.weightNanos))
      val grad = feats
        .select(gradAgg(col("y"), col("xb"), col("xv")).as("g"))
        .head.getAs[scala.collection.Seq[Long]](0)
      val w = model.weightNanos.clone()
      var b = 0
      while (b < dim) {
        w(b) = w(b) - quantize(lr * (grad(b) / 1e9) / n)
        b += 1
      }
      val bias = model.biasNano - quantize(lr * (grad(dim) / 1e9) / n)
      model = LogisticModel(dim, bias, w)
      it += 1
    }
    feats0.unpersist()
    model
  }

  /** Map-only scoring: (idCol, round(σ(w·x+b), 6) score, pred 0/1).
    * Empty documents score at the bias alone.
    */
  def scoreLogistic(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LogisticModel,
      outCol: String = "quality_score"): DataFrame = {
    val m = model
    val f = udf((t: String) =>
      1.0 / (1.0 + math.exp(-margin(m, hashFeatures(t, m.dim)))))
    docs.select(col(idCol), round(f(col(textCol)), 6).as(outCol))
      .withColumn("pred", (col(outCol) >= 0.5).cast("int"))
  }

  /** Self-classification convenience: train on `(labelCol, textCol)`,
    * score the same frame.
    */
  def naiveBayesSelf(
      docs: DataFrame,
      labelCol: String,
      idCol: String,
      textCol: String,
      outCol: String = "label_pred"): DataFrame =
    scoreNaiveBayes(docs, idCol, textCol,
      trainNaiveBayes(docs, labelCol, idCol, textCol), outCol)
}
