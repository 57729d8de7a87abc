package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style "perplexity filter"
  * step of a corpus pipeline (CCNet scores documents with a KenLM model
  * and drops the worst tail; the unigram variant is the
  * model-free version: a document whose tokens are corpus-typical scores
  * low average negative log-likelihood, gibberish scores high).
  *
  * Two-phase, like [[Search.bm25Stats]]: (1) one token-keyed aggregate
  * builds the unigram table, collected to the driver — bounded by the
  * VOCABULARY size, not the corpus (document collections plateau at
  * ~100k-1M distinct tokens; at 1M entries the broadcast is ~30 MB). (2)
  * scoring is a map-only compiled kernel: per token, add-one-smoothed
  * −ln((count+1)/(total+|V|)), summed in document order, divided by
  * document length. Tokens unseen in training (possible when `train` is
  * a different frame than `docs`) fall back to the smoothing floor
  * −ln(1/(total+|V|)).
  *
  * ORDER-INSENSITIVE SUM: each token's −ln term is quantized to 1e-9
  * (half-up) and accumulated as a Long, so the per-document total is
  * exact integer addition — the oracle's hash aggregate may sum the
  * joined rows in any order and still lands on the identical value
  * (it sums the same DECIMAL(38,9) terms). A raw Double sum would make
  * the gate depend on floating-point summation ORDER across engines.
  * The presented score is round(avg_nll, 6) — the house float
  * convention (q_entropy pins that ln parity holds within it).
  */
object LanguageModel {

  /** Unigram table: token → count, plus the totals the smoother needs. */
  final case class Unigrams(counts: Map[String, Long], total: Long, vocabSize: Long)

  /** Phase 1: token counts over `train` (one map-side-combined
    * aggregate; result bounded by |vocab|, which plateaus at ~100k–1M
    * for natural-language corpora). The `maxVocab` cap makes the driver
    * contract explicit: a corpus whose "vocabulary" grows with size
    * (binary soup, unsegmented text) fails loudly instead of creeping
    * toward a driver OOM. Byte math behind the 2M default: a
    * `Map[String, Long]` entry costs ~100 bytes of JVM heap (boxed Long
    * + String header/chars + hash-trie node), so 2M entries ≈ 200 MB on
    * the driver AND inside every executor the broadcast reaches — about
    * the most a shared-cluster task should pin. Raise it deliberately
    * with the same arithmetic, or keep the model distributed via
    * [[scoreBigramsJoined]]-style joins.
    */
  def trainUnigrams(
      train: DataFrame,
      idCol: String,
      textCol: String,
      maxVocab: Long = 2000000L): Unigrams = {
    require(maxVocab > 0 && maxVocab < Int.MaxValue,
      s"maxVocab must be in (0, Int.MaxValue), got $maxVocab")
    // one job: collect at most maxVocab+1 rows — the extra row IS the
    // overflow signal, so no separate pre-count pass is needed
    val rows = Vocabulary.docTermFrequencies(train, idCol, textCol)
      .groupBy(col("token")).agg(sum(col("tf")).as("c"))
      .limit(maxVocab.toInt + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(rows.nonEmpty, "trainUnigrams: empty corpus")
    require(rows.length <= maxVocab,
      s"trainUnigrams: distinct tokens exceed maxVocab=$maxVocab " +
        "(~100 bytes of driver+executor heap per entry) — raise it " +
        "deliberately or pre-prune the vocabulary")
    Unigrams(rows.toMap, rows.map(_._2).sum, rows.length.toLong)
  }

  /** Phase 2: (idCol, n_tokens, avg_nll) per document with at least one
    * token — map-only. avg_nll is the add-one-smoothed mean negative
    * log-likelihood, rounded to 6 dp; lower = more corpus-typical.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Unigrams): DataFrame = {
    val denom = (model.total + model.vocabSize).toDouble
    val counts = model.counts
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.isEmpty) null
      else {
        // Long accumulator of 1e-9-quantized terms: terms are < ~50, so
        // even 10M-token documents stay far under 2^53 — exact
        var nanos = 0L
        var i = 0
        while (i < toks.length) {
          val c = counts.getOrElse(toks(i), 0L)
          val term = -math.log((c + 1.0) / denom)
          nanos += HashKernels.nanoQuant(term)
          i += 1
        }
        (toks.length, (nanos.toDouble / 1e9) / toks.length)
      }
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s._1").as("n_tokens"),
        round(col("s._2"), 6).as("avg_nll"))
  }

  /** Self-scoring convenience: train on `docs`, score `docs`. */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreDocs(docs, idCol, textCol, trainUnigrams(docs, idCol, textCol))

  /** Bigram model: unigram table plus `"w1 w2"`-keyed bigram counts and
    * per-prefix continuation totals. Bounded by the distinct-BIGRAM
    * count; at web scale prune with `minCount` (rare bigrams fall back
    * to the same smoothing floor as unseen ones — the standard
    * count-cutoff LM compression).
    */
  final case class Bigrams(
      uni: Unigrams,
      bi: Map[String, Long],
      prefix: Map[String, Long])

  /** Train a bigram model: the unigram aggregate plus ONE bigram-keyed
    * map-side-combined aggregate (a per-doc kernel emits adjacent
    * pairs). `minCount` drops rare bigrams from the broadcast model.
    *
    * DRIVER-COLLECT PATH — the bigram vocabulary grows far faster than
    * the unigram one (billions of entries at web scale), so the collect
    * is gated by a MANDATORY `maxEntries` cap. The cap is enforced in
    * the SAME job as the collect (limit maxEntries+1 — the extra row is
    * the overflow signal), so the guarded path runs the explode+groupBy
    * aggregation exactly once. The 5M default ≈ 600 MB of driver heap
    * (~120 bytes/entry: two-word key string + boxed Long + map node).
    * Past the cap, use [[scoreBigramsJoined]]: same numbers, bigram
    * table never leaves the cluster.
    */
  def trainBigrams(
      train: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 1L,
      maxEntries: Long = 5000000L): Bigrams = {
    require(maxEntries > 0 && maxEntries < Int.MaxValue,
      s"maxEntries must be in (0, Int.MaxValue), got $maxEntries")
    val uni = trainUnigrams(train, idCol, textCol)
    val pairsUdf = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.length < 2) Array.empty[String]
      else Array.tabulate(toks.length - 1)(i => toks(i) + " " + toks(i + 1))
    })
    val agg = train.select(explode(pairsUdf(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val rows = agg.limit(maxEntries.toInt + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(rows.length <= maxEntries,
      s"trainBigrams: distinct bigrams exceed the driver-collect cap " +
      s"($maxEntries, ~120 bytes of driver heap per entry) — raise minCount " +
      "or use scoreBigramsJoined, which keeps the bigram table distributed")
    val prefix = new scala.collection.mutable.HashMap[String, Long]()
    rows.foreach { case (bg, c) =>
      val w1 = bg.substring(0, bg.indexOf(' '))
      prefix.update(w1, prefix.getOrElse(w1, 0L) + c)
    }
    Bigrams(uni, rows.toMap, prefix.toMap)
  }

  /** Bigram scoring: the first token takes its add-one unigram NLL, each
    * following token the Laplace-smoothed conditional
    * `−ln((c(w₁w₂)+1)/(c(w₁·)+|V|))`. Same quantized-Long accumulation
    * as [[scoreDocs]] — exactly SQL-replayable (q_bigram_score). A
    * document whose every adjacent pair is corpus-typical scores low;
    * shuffled or templated word soup scores high even when its
    * UNIGRAMS are typical — the signal the unigram filter cannot see.
    * Map-only; output `(idCol, n_tokens, round(avg_nll, 6))`.
    */
  def scoreBigrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Bigrams): DataFrame = {
    val uniDenom = (model.uni.total + model.uni.vocabSize).toDouble
    val vsz = model.uni.vocabSize.toDouble
    val uniCounts = model.uni.counts
    val bi = model.bi
    val prefix = model.prefix
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.isEmpty) null
      else {
        var nanos = 0L
        val first = -math.log((uniCounts.getOrElse(toks(0), 0L) + 1.0) / uniDenom)
        nanos += HashKernels.nanoQuant(first)
        var i = 1
        while (i < toks.length) {
          val c = bi.getOrElse(toks(i - 1) + " " + toks(i), 0L)
          val cp = prefix.getOrElse(toks(i - 1), 0L)
          val term = -math.log((c + 1.0) / (cp + vsz))
          nanos += HashKernels.nanoQuant(term)
          i += 1
        }
        (toks.length, (nanos.toDouble / 1e9) / toks.length)
      }
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s._1").as("n_tokens"),
        round(col("s._2"), 6).as("avg_nll"))
  }

  /** Self-scoring convenience: train bigrams on `docs`, score `docs`. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreBigrams(docs, idCol, textCol, trainBigrams(docs, idCol, textCol))

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney ICASSP '95,
    * Chen & Goodman '98 formulation, fixed discount): beyond the raw
    * counts it carries the TYPE statistics KN smoothing runs on —
    * N1+(w1·) distinct followers per prefix, N1+(·w2) distinct
    * predecessors per word (the "how many contexts has this word
    * completed" signal that beats raw frequency for backoff), and the
    * distinct-bigram total. All derived from the SAME single bigram
    * aggregate as [[Bigrams]].
    */
  final case class KneserNeyModel(
      bi: Map[String, Long],
      prefix: Map[String, Long],
      rightTypes: Map[String, Long],
      leftTypes: Map[String, Long],
      nBigramTypes: Long,
      vocabSize: Long,
      discount: Double)

  def trainKneserNey(
      train: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 1L,
      maxEntries: Long = 5000000L,
      discount: Double = 0.75): KneserNeyModel = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val base = trainBigrams(train, idCol, textCol, minCount, maxEntries)
    val right = new scala.collection.mutable.HashMap[String, Long]()
    val left = new scala.collection.mutable.HashMap[String, Long]()
    base.bi.keysIterator.foreach { bg =>
      val sp = bg.indexOf(' ')
      val w1 = bg.substring(0, sp)
      val w2 = bg.substring(sp + 1)
      right.update(w1, right.getOrElse(w1, 0L) + 1L)
      left.update(w2, left.getOrElse(w2, 0L) + 1L)
    }
    KneserNeyModel(base.bi, base.prefix, right.toMap, left.toMap,
      base.bi.size.toLong, base.uni.vocabSize, discount)
  }

  /** KN-smoothed scoring: the first token takes the floored continuation
    * NLL −ln(Pc(w)), each following token the interpolated conditional
    * `max(c₁₂−D,0)/c₁· + D·N1+(w₁·)/c₁· · Pc(w₂)` (backing off straight
    * to Pc for unseen prefixes), with
    * `Pc(w) = (N1+(·w)+0.5) / (T + 0.5(|V|+1))` — the half-count floor
    * keeps OOV finite while preserving the continuation-count ordering
    * KN is about. Always < 1 (c₁₂ ≤ c₁·, λ ≤ D, Pc < 1), so terms are
    * positive; same 1e-9-quantized-Long accumulation as every scorer
    * here — exactly SQL-replayable (q_bigram_kn).
    */
  def scoreKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: KneserNeyModel): DataFrame = {
    val d = m.discount
    val pcDen = m.nBigramTypes + 0.5 * (m.vocabSize + 1.0)
    val bi = m.bi; val prefix = m.prefix
    val right = m.rightTypes; val left = m.leftTypes
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      if (toks.isEmpty) null
      else {
        def pcont(w: String): Double = (left.getOrElse(w, 0L) + 0.5) / pcDen
        var nanos = HashKernels.nanoQuant(-math.log(pcont(toks(0))))
        var i = 1
        while (i < toks.length) {
          val w1 = toks(i - 1)
          val c1 = prefix.getOrElse(w1, 0L)
          val p =
            if (c1 > 0L) {
              val c12 = bi.getOrElse(w1 + " " + toks(i), 0L)
              math.max(c12 - d, 0.0) / c1 +
                d * right.getOrElse(w1, 0L) / c1 * pcont(toks(i))
            } else pcont(toks(i))
          nanos += HashKernels.nanoQuant(-math.log(p))
          i += 1
        }
        (toks.length, (nanos.toDouble / 1e9) / toks.length)
      }
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), col("s._1").as("n_tokens"),
        round(col("s._2"), 6).as("avg_nll"))
  }

  /** Self-scoring convenience: train KN on `docs`, score `docs`. */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreKneserNey(docs, idCol, textCol, trainKneserNey(docs, idCol, textCol))

  /** Bigram scoring with the model kept DISTRIBUTED — the 100 TB path.
    * No bigram table ever reaches the driver: documents explode to one
    * `(id, pos, prev, cur)` row per token, the bigram and per-prefix
    * counts arrive via token-keyed shuffle joins (first-token rows — one
    * per document — take their unigram count through a separate tiny
    * join), and each row's NLL term goes through the SAME `math.log` +
    * [[HashKernels.nanoQuant]] kernel as [[scoreBigrams]], so the
    * per-document integer `sum` lands on the bit-identical Long no
    * matter how the shuffle orders the rows. LanguageModelSpec pins
    * joined == collected bit-for-bit; `q_bigram_score_dist` pins it
    * against the DuckDB oracle. Only the two scalars (total token
    * count, vocab size) are driver-side — one 1-row aggregate.
    */
  def scoreBigramsJoined(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame): DataFrame = {
    val uni = Vocabulary.docTermFrequencies(train, idCol, textCol)
      .groupBy(col("token")).agg(sum(col("tf")).as("uc"))
    val head = uni.agg(sum(col("uc")), count(lit(1))).head()
    val total = head.getLong(0)
    val vsz = head.getLong(1)
    require(total > 0, "scoreBigramsJoined: empty corpus")
    val uniDenom = (total + vsz).toDouble
    val vszD = vsz.toDouble

    // one row per token: (pos, prev-token-or-null, token)
    val pairUdf = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      Array.tabulate(toks.length)(i =>
        (i, if (i == 0) null else toks(i - 1), toks(i)))
    })
    val trainPairs = train
      .select(explode(pairUdf(col(textCol))).as("p"))
      .select(col("p._2").as("w1"), col("p._3").as("w2"))
      .filter(col("w1").isNotNull)
    val bigrams = trainPairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("bc"))
    val prefixes = bigrams.groupBy(col("w1")).agg(sum(col("bc")).as("pc"))

    val docPairs = docs
      .select(col(idCol), explode(pairUdf(col(textCol))).as("p"))
      .select(col(idCol), col("p._1").as("pos"),
        col("p._2").as("prev"), col("p._3").as("cur"))

    // first-token rows: one per doc, unigram-smoothed
    val firstUdf = udf((uc: Long) =>
      HashKernels.nanoQuant(-math.log((uc + 1.0) / uniDenom)))
    val first = docPairs.filter(col("pos") === 0)
      .join(uni, docPairs("cur") === uni("token"), "left")
      .select(col(idCol),
        firstUdf(coalesce(col("uc"), lit(0L))).as("nanos"))

    // rest: Laplace-smoothed conditional via two token-keyed joins
    val restUdf = udf((bc: Long, pc: Long) =>
      HashKernels.nanoQuant(-math.log((bc + 1.0) / (pc + vszD))))
    val rest = docPairs.filter(col("pos") > 0)
      .join(bigrams,
        docPairs("prev") === bigrams("w1") && docPairs("cur") === bigrams("w2"),
        "left")
      .drop("w1", "w2")
      .join(prefixes, docPairs("prev") === prefixes("w1"), "left")
      .select(col(idCol),
        restUdf(coalesce(col("bc"), lit(0L)), coalesce(col("pc"), lit(0L)))
          .as("nanos"))

    first.unionByName(rest)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), sum(col("nanos")).as("nanos"))
      .select(col(idCol), col("n").cast("int").as("n_tokens"),
        round(col("nanos").cast("double") / lit(1e9) / col("n").cast("double"), 6)
          .as("avg_nll"))
  }

  /** CCNet's selection step: bucket documents into head / middle / tail
    * by perplexity terciles (CCNet trains on the head, optionally the
    * middle, and drops the tail). Cuts are EXACT interpolated
    * percentiles of the rounded scores — a one-row aggregate broadcast
    * back over the scored frame, so the corpus is never re-shuffled.
    * Bucket boundaries are engine-stable: both engines interpolate
    * inside the same sorted bracket, so even last-bit differences in
    * the cut value cannot reclassify a document (the cut lands strictly
    * between two distinct 6-dp scores, or exactly on one in both).
    * Output: `(idCol, n_tokens, avg_nll, bucket)`.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = unigramScore(docs, idCol, textCol)
    val cuts = scored.agg(
      expr("percentile(avg_nll, CAST(1.0/3 AS DOUBLE))").as("__q1"),
      expr("percentile(avg_nll, CAST(2.0/3 AS DOUBLE))").as("__q2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("avg_nll") <= col("__q1"), lit("head"))
          .when(col("avg_nll") <= col("__q2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col("n_tokens"), col("avg_nll"), col("bucket"))
  }
}
