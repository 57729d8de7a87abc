package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting — "Data Selection via Importance
  * Resampling" (Xie et al., arXiv:2302.03169): score every raw-corpus
  * document by how much more likely its token bag is under a TARGET
  * distribution (wiki/books/curated text) than under the RAW crawl
  * distribution, then keep the upper tail. The log importance weight is
  * `Σ_tok [ln p_target(tok) − ln p_raw(tok)]` with add-one smoothing
  * over the union vocabulary.
  *
  * Spark shape: both unigram models are single token-keyed
  * map-side-combined aggregates (vocab-bounded, NOT corpus-bounded);
  * the merged per-token deltas broadcast inside a compiled kernel and
  * scoring is map-only — zero shuffles over the 100 TB frame. Each
  * −ln term is quantized to 1e-9 and accumulated as a Long (the
  * [[LanguageModel]] convention), so the DuckDB oracle replays the
  * pipeline exactly (q_dsir_weights).
  *
  * For vocabularies that do NOT plateau (web-scale shingled features),
  * `hashBuckets > 0` switches the feature space to hashed buckets
  * (DSIR §2.3 uses 10k hashed n-gram buckets): the model size becomes a
  * fixed `hashBuckets` longs regardless of corpus, at the price of
  * collision mixing — the paper's own trade. Bucketing happens inside
  * the same aggregates (still one pass); the exact path stays the
  * oracle-audited default.
  */
object Dsir {

  /** token → quantized (−ln p_raw) − (−ln p_target) nanos; positive =
    * target-typical. `unseenNanos` covers tokens outside the union
    * vocabulary (only reachable when scoring a frame disjoint from
    * both training frames).
    */
  final case class ImportanceModel(deltaNanos: Map[String, Long], unseenNanos: Long)

  private def quantize(x: Double): Long = HashKernels.nanoQuant(x)

  private val Fnv64Offset = 0xcbf29ce484222325L
  private val Fnv64Prime = 0x100000001b3L

  private[ops] def bucketOf(token: String, buckets: Int): String = {
    var h = Fnv64Offset
    var i = 0
    while (i < token.length) {
      h ^= token.charAt(i).toLong
      h *= Fnv64Prime
      i += 1
    }
    (java.lang.Long.remainderUnsigned(h, buckets.toLong)).toString
  }

  private def unigramCounts(
      df: DataFrame, idCol: String, textCol: String,
      hashBuckets: Int): Map[String, Long] = {
    val tf = Vocabulary.docTermFrequencies(df, idCol, textCol)
    val keyed =
      if (hashBuckets <= 0) tf
      else {
        val b = udf((t: String) => bucketOf(t, hashBuckets))
        tf.withColumn("token", b(col("token")))
      }
    keyed.groupBy(col("token")).agg(sum(col("tf")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Fit per-token log-ratio deltas from a target and a raw frame (two
    * vocab-bounded aggregates; collected model = |union vocab| longs,
    * or `hashBuckets` longs when bucketed).
    */
  def trainImportance(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      hashBuckets: Int = 0): ImportanceModel = {
    val tgt = unigramCounts(target, idCol, textCol, hashBuckets)
    val rw = unigramCounts(raw, idCol, textCol, hashBuckets)
    require(tgt.nonEmpty && rw.nonEmpty, "trainImportance: empty corpus")
    val vocab = tgt.keySet ++ rw.keySet
    val denomT = (tgt.values.sum + vocab.size).toDouble
    val denomR = (rw.values.sum + vocab.size).toDouble
    val deltas = vocab.iterator.map { tok =>
      val nllT = quantize(-math.log((tgt.getOrElse(tok, 0L) + 1.0) / denomT))
      val nllR = quantize(-math.log((rw.getOrElse(tok, 0L) + 1.0) / denomR))
      tok -> (nllR - nllT)
    }.toMap
    val unseen = quantize(-math.log(1.0 / denomR)) - quantize(-math.log(1.0 / denomT))
    ImportanceModel(deltas, unseen)
  }

  /** Map-only scoring: `(idCol, n_tokens, round(log_weight, 6))` per
    * document with at least one token; higher = more target-like.
    */
  def scoreImportance(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: ImportanceModel,
      hashBuckets: Int = 0): DataFrame = {
    val deltas = model.deltaNanos
    val unseen = model.unseenNanos
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.isEmpty) null
      else {
        var nanos = 0L
        var i = 0
        while (i < toks.length) {
          val key = if (hashBuckets <= 0) toks(i) else bucketOf(toks(i), hashBuckets)
          nanos += deltas.getOrElse(key, unseen)
          i += 1
        }
        (toks.length, nanos.toDouble / 1e9)
      }
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s._1").as("n_tokens"),
        round(col("s._2"), 6).as("log_weight"))
  }

  /** Convenience: fit on (target, raw) and score `raw` itself — the
    * standard DSIR selection setup.
    */
  def importanceWeights(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      hashBuckets: Int = 0): DataFrame =
    scoreImportance(raw, idCol, textCol,
      trainImportance(target, raw, idCol, textCol, hashBuckets), hashBuckets)
}
