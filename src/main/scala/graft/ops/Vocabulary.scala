package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics — the "build the tokenizer's world view"
  * step of a training-data pipeline: per-token collection frequency and
  * document frequency, and the exact global top-k of the vocabulary.
  *
  * Scale shape: term frequencies are counted PER DOCUMENT inside a
  * compiled kernel (map-only; one (token, tf) pair per distinct token per
  * doc — already the minimal exchange payload), then one token-keyed
  * hash aggregate with map-side combine. Head tokens ("the") are the
  * classic skew key, but the partial aggregate bounds their per-task
  * state to one row each, so the shuffle carries ≤ |vocab slice| rows per
  * map task regardless of corpus size. Top-k selection reuses the
  * bounded-heap [[TopKAggregator]] — no global sort of the vocabulary.
  *
  * Tokenization matches [[TextAnalysis.tokens]] (lowercased whitespace
  * tokens), so counts line up with the rest of the text family and the
  * DuckDB oracle.
  */
object Vocabulary {

  /** Distinct (token, tf) pairs of one document, first-occurrence order. */
  def termFreqs(text: String): Array[(String, Int)] = {
    val toks = HashKernels.tokensOf(text)
    val counts = new java.util.LinkedHashMap[String, Int]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1, (a, b) => a + b)
      i += 1
    }
    val out = new Array[(String, Int)](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = (e.getKey, e.getValue)
      j += 1
    }
    out
  }

  private val termFreqsUdf = udf((t: String) => termFreqs(t))

  /** Long form (idCol, token, tf): one row per distinct token per doc. */
  def docTermFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(termFreqsUdf(col(textCol))).as("tt"))
      .select(col(idCol), col("tt._1").as("token"), col("tt._2").as("tf"))

  /** (token, total_count, doc_freq) over the corpus — one token-keyed
    * aggregate; `tf` pairs are distinct per doc, so `count(*)` IS the
    * document frequency (same trick as Decontaminate's overlap count).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    docTermFrequencies(df, idCol, textCol)
      .groupBy(col("token"))
      .agg(sum(col("tf")).as("total_count"), count(lit(1)).as("doc_freq"))

  /** Exact global top-k tokens by (total_count DESC, token ASC), with a
    * 1-based rank — selection through the bounded-heap aggregate (each
    * map task reduces its vocabulary slice to k candidates before the
    * exchange; no global sort). doc_freq rides along via a broadcast
    * re-join of the k winners against the vocabulary frame.
    */
  def topVocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val vocab = vocabulary(df, idCol, textCol)
    val ranked = TopKAggregator.topKByGroup(
      vocab.withColumn("__g", lit(1)),
      "__g", "token", "total_count", k,
      outId = "token", outSim = "__score", outRank = "rank")
      .drop("__g")
    vocab.join(broadcast(ranked.select(col("token"), col("rank"))), Seq("token"))
      .select(col("token"), col("total_count"), col("doc_freq"), col("rank"))
  }
}
