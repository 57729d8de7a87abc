package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus (Robertson/Spärck Jones
  * probabilistic relevance — the lexical-search baseline every corpus
  * tooling stack needs next to the embedding ANN family).
  *
  * Two-phase job, like the IVF trainer: (1) two light aggregates compute
  * the corpus constants — N, average document length, per-query-term
  * document frequency (|terms| rows collected to the driver; the corpus
  * never shuffles); (2) scoring is a MAP-ONLY compiled kernel over each
  * document's tokens, followed by bounded-heap top-k selection
  * ([[TopKAggregator]] — no global sort, each map task forwards ≤ k
  * candidates). At 100 TB phase 1 is map-side-combined aggregation and
  * phase 2 is embarrassingly parallel.
  *
  * DETERMINISM CONTRACT: per-term contributions are summed in the
  * caller's term order, both engines evaluate the same expression tree
  * on the same inputs, and the presented score is `round(score, 6)` on
  * both sides (the house float convention — q_entropy pins that log
  * parity holds within it). Ranking uses the ROUNDED score (desc, id
  * asc) so the top-k cut is stable across engines.
  */
object Search {

  /** Per-term BM25 constants, driver-computed. */
  final case class TermStat(term: String, docFreq: Long, idf: Double)

  /** Corpus constants for one query: document count, average token
    * length, per-term stats (terms keep the caller's order — it is the
    * summation order of the score).
    */
  final case class Bm25Stats(nDocs: Long, avgdl: Double, terms: Seq[TermStat])

  /** Phase 1: N, avgdl, and document frequency for each query term. */
  def bm25Stats(
      docs: DataFrame,
      textCol: String,
      terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    val row = docs.select(
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
      .agg(count(lit(1)), sum(col("dl"))).collect()(0)
    val n = row.getLong(0)
    val totalTokens = if (row.isNullAt(1)) 0L else row.getLong(1)
    require(n > 0, "bm25 over an empty corpus")
    val avgdl = totalTokens.toDouble / n.toDouble
    val dfByTerm = Vocabulary.docTermFrequencies(
      docs.select(col(textCol)).withColumn("__id", lit(1)), "__id", textCol)
      .filter(col("token").isin(terms: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = terms.map { t =>
      val df = dfByTerm.getOrElse(t, 0L)
      // Robertson's "+1" idf: always positive, no branch for df > N/2.
      // (n - df) in LONG then + 0.5 — the oracle mirrors this exactly.
      TermStat(t, df, math.log(1.0 + ((n - df) + 0.5) / (df + 0.5)))
    }
    Bm25Stats(n, avgdl, stats)
  }

  /** Compiled scoring kernel: Σ over terms (caller's order) of
    * idf · tf·(k1+1) / (tf + k1·((1−b) + b·(dl/avgdl))). All double
    * constants are precomputed; `tf` counts exact token matches.
    */
  private def score(
      toks: Array[String],
      terms: Array[String],
      idfs: Array[Double],
      k1: Double, k1p1: Double, oneMinusB: Double, b: Double,
      avgdl: Double): Double = {
    val dl = toks.length.toDouble
    var s = 0.0
    var t = 0
    while (t < terms.length) {
      var tf = 0
      var i = 0
      while (i < toks.length) {
        if (toks(i) == terms(t)) tf += 1
        i += 1
      }
      s += idfs(t) * ((tf * k1p1) / (tf + k1 * (oneMinusB + b * (dl / avgdl))))
      t += 1
    }
    s
  }

  /** Phase 2: top-k documents by BM25 score (rounded-score DESC, id ASC
    * ties), columns (idCol, score, rank) with score rounded to 6 dp.
    * Map-only scoring + bounded-heap selection.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      precomputed: Option[Bm25Stats] = None): DataFrame = {
    val st = precomputed.getOrElse(bm25Stats(docs, textCol, terms))
    val termArr = st.terms.map(_.term).toArray
    val idfArr = st.terms.map(_.idf).toArray
    val (k1v, k1p1, oneMinusB, bv, avgdl) = (k1, k1 + 1.0, 1.0 - b, b, st.avgdl)
    val scoreUdf = udf((text: String) =>
      score(HashKernels.tokensOf(text), termArr, idfArr,
        k1v, k1p1, oneMinusB, bv, avgdl))
    val scored = docs.select(col(idCol),
      round(scoreUdf(col(textCol)), 6).as("__score"), lit(1).as("__g"))
    TopKAggregator.topKByGroup(scored, "__g", idCol, "__score", k,
      outId = idCol, outSim = "score", outRank = "rank")
      .drop("__g")
  }

  /** The DuckDB oracle for [[bm25TopK]] — generated but fully
    * self-contained (N, avgdl, document frequencies, idf are computed IN
    * SQL with the identical expression tree the Scala side evaluates),
    * so one string serves every scale factor. `k1` / `b` and their
    * derived constants are inlined via Double.toString round-trip
    * literals so both engines start from the same bit patterns.
    */
  def bm25OracleSql(
      table: String,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    require(terms.forall(_.matches("[A-Za-z0-9_-]+")),
      s"query terms must be [A-Za-z0-9_-]+ (they embed in SQL literals): $terms")
    def lit17(d: Double): String = java.lang.Double.toString(d)
    val k1L = lit17(k1)
    val k1p1 = lit17(k1 + 1.0)
    val oneMinusB = lit17(1.0 - b)
    val bL = lit17(b)
    val dfSelects = terms.zipWithIndex.map { case (t, i) =>
      s"(SELECT count(*) FROM t WHERE list_contains(toks, '$t')) AS df$i"
    }
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      val tf = s"len([x FOR x IN toks IF x = '$t'])"
      val idf = s"ln(1.0 + ((c.n - c.df$i) + 0.5) / (c.df$i + 0.5))"
      s"$idf * (($tf * $k1p1) / ($tf + $k1L * ($oneMinusB + $bL * (CAST(len(toks) AS DOUBLE) / c.avgdl))))"
    }
    s"""WITH t AS (
       |  SELECT $idCol, regexp_extract_all(lower(trim($textCol)), '\\S+') AS toks
       |  FROM $table),
       |c AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       |    ${dfSelects.mkString(",\n    ")}
       |  FROM t),
       |scored AS (
       |  SELECT $idCol, round(${contribs.mkString("\n    + ")}, 6) AS score
       |  FROM t CROSS JOIN c)
       |SELECT $idCol, score,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, $idCol) AS INT) AS rank
       |FROM scored ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  /** TF-IDF top-m terms per document — the classic keyword extractor /
    * sparse-vectorizer step (Spärck Jones idf; reference analogue: the
    * per-position frequency tables of `seq_tables.py`'s distribution
    * family, generalized to free text).
    *
    * Scale shape: (1) per-doc (token, tf) pairs from the compiled
    * [[Vocabulary.termFreqs]] kernel — map-only, minimal exchange
    * payload; (2) document frequency = ONE token-keyed aggregate with
    * map-side combine (per-task state bounded by |vocab slice|, head
    * tokens collapse to one partial row each); (3) the tf frame joins df
    * on token — vocabulary plateaus under Heaps' law, so AQE broadcasts
    * it when small and falls back to a token-keyed shuffle join when
    * not; (4) per-doc top-m via the bounded-heap [[TopKAggregator]] (no
    * window, each map task forwards ≤ m candidates per doc).
    *
    * DETERMINISM CONTRACT: idf = ln(N / df) evaluated in doubles with
    * the identical expression tree on both engines; the presented score
    * is `round(tf · idf, 6)` and ranking uses the ROUNDED score
    * (desc, token asc) so the top-m cut is engine-stable. Documents with
    * no tokens emit no rows.
    */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: Int): DataFrame = {
    require(m > 0, s"tfidf top-m needs m > 0, got $m")
    val n = docs.count()
    require(n > 0, "tfidf over an empty corpus")
    val tf = Vocabulary.docTermFrequencies(docs, idCol, textCol)
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val scored = tf.join(docFreq, Seq("token"))
      .select(col(idCol), col("token"),
        round(col("tf") * log(lit(n.toDouble) / col("__df")), 6)
          .as("__score"))
    TopKAggregator.topKByGroup(scored, idCol, "token", "__score", m,
      outId = "token", outSim = "tfidf", outRank = "rank")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked lists:
    * rrf(d) = Σ_lists 1/(c + rank_list(d)), the standard way to combine a
    * lexical (BM25) and a semantic (embedding) retriever without score
    * calibration. Each input needs (idCol, rank); absent docs contribute
    * nothing. Contributions are rounded to 1e-9 and summed as
    * DECIMAL(38,9) — order-insensitive exact addition, so the fused score
    * is reproducible and SQL-replayable. Selection of the fused top-k is
    * the bounded-heap aggregate (ties: id ascending). Output: (idCol,
    * rrf, n_lists, rank). The inputs are top-k frames (tiny); everything
    * here is driver-scale-free and shuffles at most Σ|lists| rows.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 0, s"rrf constant must be >= 0, got $c")
    val contribs = rankings.map(_.select(col(idCol),
      round(lit(1.0) / (lit(c) + col("rank")), 9)
        .cast("decimal(38,9)").as("__contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(
        round(sum(col("__contrib")).cast("double"), 6).as("__rrf"),
        count(lit(1)).as("n_lists"))
    TopKAggregator.topKByGroup(
      fused.withColumn("__g", lit(1)), "__g", idCol, "__rrf", k,
      outId = idCol, outSim = "rrf", outRank = "rank")
      .drop("__g")
      .join(fused.select(col(idCol), col("n_lists")), Seq(idCol))
      .select(col(idCol), col("rrf"), col("n_lists"), col("rank"))
  }

  /** Positional postings — the atom under the inverted index and phrase
    * search: one row per token OCCURRENCE, (doc, token, pos) with pos
    * 1-based in whitespace-token order. Map-only (posexplode of the
    * split), the same `\S+`-equivalent tokenizer as BM25/vocabulary.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("__p", "token")))
      .filter(col("token") =!= "")
      .select(col(idCol), col("token"), (col("__p") + 1).as("pos"))

  /** The inverted index a distributed retrieval layer persists: one row
    * per (token, doc) posting carrying tf + first/last occurrence, plus
    * the token's document frequency for IDF. Shape at 100 TB: one
    * (token, doc)-keyed partial-combined aggregate, one token-keyed df
    * aggregate, one token equi-join — no windows, no driver state.
    */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val postings = positionalPostings(docs, idCol, textCol)
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
    val dfreq = postings.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    postings.join(dfreq, Seq("token"))
      .select(col("token"), col(idCol), col("tf"), col("df"),
        col("first_pos"), col("last_pos"))
  }

  /** BM25 top-k scored THROUGH the inverted index — the query path a
    * persisted 100 TB index serves: tf from a (doc, term)-keyed postings
    * aggregate, df/idf from a term-keyed aggregate joined back (n-term
    * broadcast), dl joined on the doc key, and the per-doc sum done in
    * round-9 DECIMAL(38,9) so the aggregation is order-free (the
    * map-only [[bm25TopK]] sums terms sequentially in a UDF closure —
    * an aggregate cannot promise that order, so it quantizes instead).
    * Same idf/scoring expression tree, same (rounded score desc, id asc)
    * ranking; docs containing no query term keep their 0.0 rows exactly
    * like the map-only path.
    */
  def bm25TopKIndexed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, s"bad terms: $terms")
    val dls = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl"))
    val row = dls.agg(count(lit(1)), sum(col("__dl"))).collect()(0)
    val n = row.getLong(0)
    require(n > 0, "bm25 over an empty corpus")
    val avgdl = (if (row.isNullAt(1)) 0.0 else row.getDouble(1)) / n.toDouble
    val tf = positionalPostings(docs, idCol, textCol)
      .filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__tfl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
      .withColumn("__idf", log(lit(1.0) +
        ((lit(n) - col("__df")).cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5))))
    val contrib = tf.join(broadcast(dfreq), Seq("token"))
      .join(dls, Seq(idCol))
      .select(col(idCol),
        round(col("__idf") * ((col("__tfl").cast("double") * lit(k1 + 1.0)) /
          (col("__tfl").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("__dl") / lit(avgdl))))), 9)
          .cast("decimal(38,9)").as("__c"))
    val scored = dls
      .join(contrib.groupBy(col(idCol)).agg(sum(col("__c")).as("__s")),
        Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("__s").cast("double"), lit(0.0)), 6).as("__score"),
        lit(1).as("__g"))
    TopKAggregator.topKByGroup(scored, "__g", idCol, "__score", k,
      outId = idCol, outSim = "score", outRank = "rank")
      .drop("__g")
  }

  /** DuckDB twin of [[bm25TopKIndexed]] — the postings/df/idf/contrib
    * chain restated as CTEs with the identical expression tree and the
    * identical round-9 DECIMAL(38,9) quantize-then-sum, so the oracle
    * gates the whole index-path derivation, not just the final ranks.
    */
  def bm25IndexedOracleSql(
      table: String,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    require(terms.forall(_.matches("[A-Za-z0-9_-]+")),
      s"query terms must be [A-Za-z0-9_-]+ (they embed in SQL literals): $terms")
    def lit17(d: Double): String = java.lang.Double.toString(d)
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (
       |  SELECT $idCol, regexp_extract_all(lower(trim($textCol)), '\\S+') AS toks
       |  FROM $table),
       |c AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM t),
       |occ AS (SELECT $idCol, unnest(toks) AS term FROM t),
       |tf AS (
       |  SELECT $idCol, term, count(*) AS tfl FROM occ
       |  WHERE term IN ($inList) GROUP BY $idCol, term),
       |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |i AS (
       |  SELECT term, ln(1.0 + (CAST(c.n - d.df AS DOUBLE) + 0.5)
       |                        / (CAST(d.df AS DOUBLE) + 0.5)) AS idf
       |  FROM d, c),
       |con AS (
       |  SELECT tf.$idCol, CAST(round(i.idf *
       |      ((CAST(tf.tfl AS DOUBLE) * ${lit17(k1 + 1.0)}) /
       |       (CAST(tf.tfl AS DOUBLE) + ${lit17(k1)} * (${lit17(1.0 - b)} +
       |        ${lit17(b)} * (CAST(len(t2.toks) AS DOUBLE) / c.avgdl)))), 9)
       |    AS DECIMAL(38,9)) AS contrib
       |  FROM tf
       |  JOIN i USING (term)
       |  JOIN t t2 ON t2.$idCol = tf.$idCol, c),
       |s AS (
       |  SELECT t.$idCol,
       |    round(COALESCE(CAST(sum(con.contrib) AS DOUBLE), 0.0), 6) AS score
       |  FROM t LEFT JOIN con ON con.$idCol = t.$idCol
       |  GROUP BY t.$idCol)
       |SELECT $idCol, score,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, $idCol) AS INT) AS rank
       |FROM s ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  /** Incremental index maintenance: fold a DELTA corpus's postings into
    * an existing [[invertedIndex]] WITHOUT re-tokenizing the base corpus
    * — the nightly crawl-append path (at 100 TB rebuilding the index to
    * add 0.1% of documents is the thing you must never do). Contract:
    * the delta's doc ids are disjoint from the index's (append-only
    * crawl; re-crawled ids go through dedup first), so (token, doc)
    * posting rows union untouched and per-token df is the count of its
    * postings. Shape: tokenize ONLY the delta, one union, one
    * token-keyed df aggregate, one join. Gate: == a full rebuild.
    */
  def mergePostings(index: DataFrame, deltaDocs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val deltaPostings = positionalPostings(deltaDocs, idCol, textCol)
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
    val all = index.select(col("token"), col(idCol), col("tf"),
      col("first_pos"), col("last_pos"))
      .unionByName(deltaPostings)
    val dfreq = all.groupBy(col("token")).agg(count(lit(1)).as("df"))
    all.join(dfreq, Seq("token"))
      .select(col("token"), col(idCol), col("tf"), col("df"),
        col("first_pos"), col("last_pos"))
  }

  /** Exact positional phrase search: occurrences of `phrase` as
    * CONSECUTIVE whitespace tokens. Each phrase slot i keeps postings of
    * its own term shifted back by i; a start position where all n slots
    * agree is a match — repeated phrase terms are handled because slots,
    * not terms, are counted. Shape: map-only broadcast join of postings
    * against the n-row slot table, then ONE (doc, start)-keyed aggregate.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = phrase.zipWithIndex.map { case (t, i) => (t.toLowerCase, i) }
      .toDF("token", "slot")
    positionalPostings(docs, idCol, textCol)
      .join(broadcast(slots), Seq("token"))
      .select(col(idCol), (col("pos") - col("slot")).as("start_pos"), col("slot"))
      .groupBy(col(idCol), col("start_pos"))
      .agg(countDistinct(col("slot")).as("__n"))
      .filter(col("__n") === phrase.length && col("start_pos") >= 1)
      .select(col(idCol), col("start_pos"))
  }
}
