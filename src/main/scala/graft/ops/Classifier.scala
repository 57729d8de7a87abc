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

  private[ops] def quantize(x: Double): Long =
    math.floor(x * 1e9 + 0.5).toLong

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
