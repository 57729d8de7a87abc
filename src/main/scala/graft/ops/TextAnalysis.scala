package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything here is a pure Column expression (whole-stage codegen, no
  * UDFs), map-side only — per-document work with no shuffle, so throughput
  * scales linearly with executors at 100 TB.
  */
object TextAnalysis {

  /** Small built-in stopword marker lists per language. Deliberately tiny —
    * the point is a deterministic, broadcast-free heuristic; callers can
    * supply their own profiles.
    */
  val MarkerWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "es" -> Seq("el", "la", "de", "los", "es", "que", "un", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "dans", "pour", "qui"))

  /** Whitespace tokens, lowercased, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Language ID by distinct-marker-word hits: argmax over per-language
    * counts of distinct marker words present; "und" (undetermined) when all
    * scores are 0. Ties break by profile order. The n-gram profile method of
    * real langid reduces to the same argmax shape — swap the marker lists
    * for n-gram profiles without changing the plan.
    */
  def languageId(text: Column, profiles: Seq[(String, Seq[String])] = MarkerWords): Column = {
    val toks = array_distinct(tokens(text))
    val scored = profiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    // fold right keeping first-listed language on ties (strict > against
    // later candidates)
    val best = scored.reverse.foldLeft((lit("und"), lit(0))) {
      case ((bLang, bScore), (lang, score)) =>
        (when(score >= greatest(bScore, lit(1)), lit(lang)).otherwise(bLang),
          greatest(score, bScore))
    }
    best._1
  }

  /** Per-language marker scores, exposed for inspection/debugging.
    * Output columns: score_<lang> for each profile.
    */
  def languageScores(df: DataFrame, textCol: String,
      profiles: Seq[(String, Seq[String])] = MarkerWords): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    profiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang",
        size(array_intersect(toks, array(words.map(lit): _*))))
    }
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric non-space characters — the shape of a byte-pair
    * pre-tokenizer's word split.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality-scoring features (length / punctuation / stopword ratios) plus
    * a composite score in [0,1]. All ratios guard against empty documents.
    *
    * Output columns appended: n_chars_q, n_tokens, avg_token_len,
    * punct_ratio, stopword_ratio, alpha_ratio, quality_score.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nChars = length(t)
    val safeChars = greatest(nChars, lit(1)).cast("double")
    val stopwords = MarkerWords.flatMap(_._2).distinct
    val punct = nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val alpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    df.withColumn("n_chars_q", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        when(nTok > 0, aggregate(toks, lit(0), (a, x) => a + length(x)).cast("double") / nTok)
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio", punct / safeChars)
      .withColumn("stopword_ratio",
        when(nTok > 0,
          size(filter(toks, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))).cast("double") / nTok)
          .otherwise(lit(0.0)))
      .withColumn("alpha_ratio", alpha / safeChars)
      .withColumn("quality_score",
        round(
          least(lit(1.0), nTok.cast("double") / lit(20.0)) * lit(0.4) +
            (lit(1.0) - least(lit(1.0), col("punct_ratio") * lit(4.0))) * lit(0.3) +
            least(lit(1.0), col("alpha_ratio") * lit(1.25)) * lit(0.3), 6))
  }

  /** Content-defined document fingerprint: the minimum MD5 over k-char
    * shingles (a 1-hash MinHash — robust to small edits, standard winnowing
    * seed). MD5 rather than xxhash so external systems can reproduce it.
    */
  def fingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(Dedup.shinglesOf(text, k), s => md5(s.cast("binary"))))

  /** Rolling polynomial hash (base 257 mod 2^61-1) of the whole document —
    * an order-sensitive fingerprint (anagram-safe, unlike shingle mins).
    */
  def rollingHash(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => pmod(acc * lit(257L) + ascii(c), lit(2305843009213693951L)))
}
