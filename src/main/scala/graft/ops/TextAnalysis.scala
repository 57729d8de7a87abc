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

  // ---- repetition / document-filter rules (Gopher-style) ----------------
  // Single-pass Scala kernels rather than higher-order Column lambdas: the
  // per-document counting is O(tokens) in a JIT'd loop, where the HOF
  // form would be interpreted per element (see HashKernels' rationale).
  // Map-only — no shuffle, linear scale-out.

  /** Lowercased whitespace tokens of a trimmed string (kernel-side twin of
    * [[tokens]]; empty input → no tokens). Locale.ROOT: the default-locale
    * toLowerCase would diverge from Spark's lower() and the SQL oracle on
    * e.g. a tr_TR JVM (dotless-ı for 'I').
    */
  private def tokenize(text: String): Array[String] = {
    val t = text.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Code-point length — the oracle's `length()` counts code points, so
    * the kernels must too or non-BMP text (emoji) drifts on length-ratio
    * boundaries (String.length counts UTF-16 units).
    */
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** Code-point (= UTF-8 byte) order — what DuckDB's binary-collated
    * `ORDER BY` and Spark's UTF8String comparison both use. Java's
    * `String.compareTo` is UTF-16 unit order, which ranks astral-plane
    * characters (surrogates 0xD800–0xDFFF) BELOW U+E000–U+FFFF and
    * would flip cross-engine tie-breaks on non-BMP grams.
    */
  private def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** (dup_line_frac, dup_line_char_frac, top_word_frac, top_2gram_frac):
    * the repetition signals of the Gopher quality rules — fraction of
    * repeated lines, fraction of characters in repeated lines, and the
    * count fraction of the most frequent word / word 2-gram.
    */
  private def repetitionKernel(text: String): (Double, Double, Double, Double) = {
    if (text == null) return (0.0, 0.0, 0.0, 0.0)
    val lines = text.split("\n", -1)
    val lineCounts = new scala.collection.mutable.HashMap[String, Int]()
    var totalChars = 0L
    lines.foreach { l => lineCounts.updateWith(l)(c => Some(c.getOrElse(0) + 1)); totalChars += cp(l) }
    val nLines = lines.length
    val dupLines = nLines - lineCounts.size
    val dupChars = lineCounts.iterator.map { case (l, c) => (c - 1).toLong * cp(l) }.sum
    val dupLineFrac = if (nLines > 0) dupLines.toDouble / nLines else 0.0
    val dupCharFrac = if (totalChars > 0) dupChars.toDouble / totalChars else 0.0
    val toks = tokenize(text)
    val wc = new scala.collection.mutable.HashMap[String, Int]()
    toks.foreach(t => wc.updateWith(t)(c => Some(c.getOrElse(0) + 1)))
    val topWordFrac =
      if (toks.nonEmpty) wc.valuesIterator.max.toDouble / toks.length else 0.0
    val bc = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i + 1 < toks.length) {
      bc.updateWith(toks(i) + " " + toks(i + 1))(c => Some(c.getOrElse(0) + 1))
      i += 1
    }
    val top2gramFrac =
      if (toks.length >= 2) bc.valuesIterator.max.toDouble / (toks.length - 1) else 0.0
    (dupLineFrac, dupCharFrac, topWordFrac, top2gramFrac)
  }

  /** Append dup_line_frac, dup_line_char_frac, top_word_frac,
    * top_2gram_frac (exact ratios; round at presentation time).
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val k = udf(repetitionKernel _)
    df.withColumn("__rep", k(col(textCol)))
      .withColumn("dup_line_frac", col("__rep._1"))
      .withColumn("dup_line_char_frac", col("__rep._2"))
      .withColumn("top_word_frac", col("__rep._3"))
      .withColumn("top_2gram_frac", col("__rep._4"))
      .drop("__rep")
  }

  /** (n_words, sum_word_len, n_alpha_words, n_stopwords, n_symbols) — the
    * integer inputs of [[gopherFilter]]'s rules, one pass per document.
    * n_symbols counts '#' characters plus non-overlapping '...' runs.
    */
  private def gopherKernel(stopwords: Set[String])(text: String): (Int, Int, Int, Int, Int) = {
    if (text == null) return (0, 0, 0, 0, 0)
    val toks = tokenize(text)
    var sumLen = 0; var alpha = 0; var stops = 0
    toks.foreach { t =>
      sumLen += cp(t)
      if (t.exists(c => c >= 'a' && c <= 'z')) alpha += 1
      if (stopwords.contains(t)) stops += 1
    }
    val hashes = text.count(_ == '#')
    val ellipses = (text.length - text.replace("...", "").length) / 3
    (toks.length, sumLen, alpha, stops, hashes + ellipses)
  }

  /** Gopher-style document filter: integer-exact threshold rules (ratio
    * thresholds are evaluated as cross-multiplied integer comparisons, so
    * engines agree bit-for-bit — no float boundary). `drop_reason` is the
    * FIRST failing rule in a fixed order, NULL when the document passes;
    * `keep` = drop_reason IS NULL.
    *
    * Rules (defaults): word count in [minWords, maxWords]; mean word
    * length in [2, 12]; symbol-to-word ratio ('#' + '...') ≤ 1/10;
    * alphabetic-word fraction ≥ 7/10; ≥ 2 stopword hits.
    */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      minWords: Int = 10,
      maxWords: Int = 100000): DataFrame = {
    val stopwords = MarkerWords.flatMap(_._2).distinct.toSet
    // nondeterministic for the same one-call-per-row reason as
    // repGopherUdf (the kernel itself is pure)
    val k = udf(gopherKernel(stopwords) _).asNondeterministic()
    val n = col("__g._1"); val sumLen = col("__g._2"); val alpha = col("__g._3")
    val stops = col("__g._4"); val symbols = col("__g._5")
    df.withColumn("__g", k(col(textCol)))
      .withColumn("drop_reason",
        when(n < minWords, "too_few_words")
          .when(n > maxWords, "too_many_words")
          .when(sumLen < n * 2 || sumLen > n * 12, "mean_word_len")
          .when(symbols * 10 > n, "symbol_ratio")
          .when(alpha * 10 < n * 7, "alpha_frac")
          .when(stops < 2, "stopwords")
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
      .withColumn("n_words", n)
      .drop("__g")
  }

  /** The integer inputs of the FULL Gopher repetition family (Rae et al.
    * 2112.11446, Table A1) in one pass per document — the counts behind
    * the line rules, the top word-n-gram char fractions (n = 2, 3, 4)
    * and the duplicated word-n-gram char fractions (n = 5..10):
    *
    *   (nLines, dupLines, lineChars, dupLineChars,
    *    totTokChars, topCount(2..4), topChars(2..4), dupChars(5..10))
    *
    * Char attribution follows the token-cover convention the public
    * reimplementations use (NeMo Curator, Dolma): a token is covered if
    * it lies inside any occurrence of an n-gram occurring ≥ 2 times in
    * the document, and fractions are over total token code points (inner
    * whitespace excluded on both sides of the ratio). topChars is the
    * word-char length of the argmax gram, tie-broken (count DESC, gram
    * ASC) so both engines pick the same gram. All outputs are integers —
    * the ratio thresholds cross-multiply downstream, so there is no
    * float boundary anywhere in the family.
    */
  private def repGopherKernel(text: String)
      : (Int, Int, Long, Long, Long, Array[Long], Array[Long], Array[Long]) = {
    val emptyTop = Array.fill(3)(0L)
    val emptyDup = Array.fill(6)(0L)
    if (text == null) return (0, 0, 0L, 0L, 0L, emptyTop, emptyTop.clone(), emptyDup)
    val lines = text.split("\n", -1)
    val lineCounts = new scala.collection.mutable.HashMap[String, Int]()
    var lineChars = 0L
    lines.foreach { l =>
      lineCounts.updateWith(l)(c => Some(c.getOrElse(0) + 1)); lineChars += cp(l)
    }
    val dupLines = lines.length - lineCounts.size
    val dupLineChars =
      lineCounts.iterator.map { case (l, c) => (c - 1).toLong * cp(l) }.sum
    val toks = tokenize(text)
    val lens = toks.map(cp)
    val totTokChars = lens.map(_.toLong).sum
    def gramAt(j: Int, n: Int): String = {
      val sb = new java.lang.StringBuilder(32)
      var k = j
      while (k < j + n) { if (k > j) sb.append(' '); sb.append(toks(k)); k += 1 }
      sb.toString
    }
    val topCount = new Array[Long](3)
    val topChars = new Array[Long](3)
    var n = 2
    while (n <= 4) {
      if (toks.length >= n) {
        val cnt = new scala.collection.mutable.HashMap[String, Int]()
        var j = 0
        while (j + n <= toks.length) {
          cnt.updateWith(gramAt(j, n))(c => Some(c.getOrElse(0) + 1)); j += 1
        }
        var bestG: String = null
        var bestC = 0
        cnt.foreach { case (g, c) =>
          if (c > bestC || (c == bestC && (bestG == null || cpLess(g, bestG)))) {
            bestG = g; bestC = c
          }
        }
        topCount(n - 2) = bestC.toLong
        topChars(n - 2) = (cp(bestG) - (n - 1)).toLong
      }
      n += 1
    }
    val dupChars = new Array[Long](6)
    n = 5
    while (n <= 10) {
      if (toks.length >= n) {
        val cnt = new scala.collection.mutable.HashMap[String, Int]()
        var j = 0
        while (j + n <= toks.length) {
          cnt.updateWith(gramAt(j, n))(c => Some(c.getOrElse(0) + 1)); j += 1
        }
        val covered = new Array[Boolean](toks.length)
        j = 0
        while (j + n <= toks.length) {
          if (cnt(gramAt(j, n)) >= 2) {
            var k = j
            while (k < j + n) { covered(k) = true; k += 1 }
          }
          j += 1
        }
        var s = 0L
        j = 0
        while (j < toks.length) { if (covered(j)) s += lens(j); j += 1 }
        dupChars(n - 5) = s
      }
      n += 1
    }
    (lines.length, dupLines, lineChars, dupLineChars, totTokChars,
      topCount, topChars, dupChars)
  }

  /** asNondeterministic is a PERFORMANCE pin, not a semantics statement —
    * the kernel is pure. CollapseProject inlines deterministic expressions
    * into every downstream reference, and codegen subexpression
    * elimination does not recover calls sitting under CASE WHEN branches
    * (they are conditionally evaluated), so the fused filter of the
    * cleaning pipeline was invoking the kernel per rule per row
    * (q_clean_corpus 1.5 s -> 14 s at sf0.1 when the repetition stage
    * landed). Nondeterministic expressions never get inlined: the struct
    * is computed once per row in its own projection and every rule reads
    * the materialized column. Same fix on [[gopherFilter]]'s kernel.
    */
  private val repGopherUdf = udf(repGopherKernel _).asNondeterministic()

  /** Per-document Gopher repetition counts — the integer numerators and
    * denominators of every Table-A1 repetition rule, map-only. Columns:
    * n_lines, dup_lines, line_chars, dup_line_chars, n_tok_chars,
    * top{2,3,4}_count, top{2,3,4}_chars, dup{5..10}_chars.
    */
  def ngramRepetition(df: DataFrame, textCol: String): DataFrame = {
    var out = df.withColumn("__r", repGopherUdf(col(textCol)))
      .withColumn("n_lines", col("__r._1"))
      .withColumn("dup_lines", col("__r._2"))
      .withColumn("line_chars", col("__r._3"))
      .withColumn("dup_line_chars", col("__r._4"))
      .withColumn("n_tok_chars", col("__r._5"))
    for (n <- 2 to 4) {
      out = out
        .withColumn(s"top${n}_count", col("__r._6").getItem(n - 2))
        .withColumn(s"top${n}_chars", col("__r._7").getItem(n - 2))
    }
    for (n <- 5 to 10)
      out = out.withColumn(s"dup${n}_chars", col("__r._8").getItem(n - 5))
    out.drop("__r")
  }

  /** Gopher Table-A1 repetition thresholds (Rae et al. 2112.11446):
    * drop when dup-line frac > 0.30, dup-line char frac > 0.20, top
    * n-gram char frac > {0.20, 0.18, 0.16} for n = {2, 3, 4}, or
    * duplicated n-gram char frac > {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}
    * for n = 5..10. `drop_reason` is the FIRST failing rule in table
    * order, NULL when the document passes. Every comparison is a
    * cross-multiplied integer test — bit-agreement with any SQL replay
    * is structural, like [[gopherFilter]].
    */
  def repetitionFilter(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = ngramRepetition(df, textCol)
    val topPct = Map(2 -> 20L, 3 -> 18L, 4 -> 16L)
    val dupPct = Map(5 -> 15L, 6 -> 14L, 7 -> 13L, 8 -> 12L, 9 -> 11L, 10 -> 10L)
    var reason: Column =
      when(col("dup_lines") * 100L > col("n_lines") * 30L, "dup_line_frac")
        .when(col("dup_line_chars") * 100L > col("line_chars") * 20L,
          "dup_line_char_frac")
    for (n <- 2 to 4)
      reason = reason.when(
        col(s"top${n}_count") * col(s"top${n}_chars") * 100L >
          col("n_tok_chars") * topPct(n), s"top_${n}gram_char_frac")
    for (n <- 5 to 10)
      reason = reason.when(
        col(s"dup${n}_chars") * 100L > col("n_tok_chars") * dupPct(n),
        s"dup_${n}gram_char_frac")
    withCounts
      .withColumn("drop_reason", reason.otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
  }

  private val deflaterLocal: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))

  private[ops] def deflatedSize(text: String): Int = {
    val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  // asNondeterministic is the same PERFORMANCE pin as repGopherUdf above
  // (the kernel is pure): the struct result feeds three downstream
  // columns, and CollapseProject inlines deterministic expressions per
  // reference — without the pin the deflate kernel runs once per
  // consumer instead of once per row.
  private val deflateUdf = udf((t: String) => if (t == null) null else {
    val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    (raw, deflatedSize(t))
  }).asNondeterministic()

  /** Deflate-compressibility quality signal (the zlib-ratio heuristic
    * web-corpus pipelines use alongside the Gopher rules: highly
    * compressible text is boilerplate or repetition; ratio near 1 is
    * high-entropy noise — both tails are suspect). Level 6, raw
    * deflate (nowrap), UTF-8 bytes. Map-only; one Deflater per executor
    * thread. Deterministic for a fixed JVM's zlib, which is what the
    * golden pin asserts — there is no SQL twin, so this family is
    * GoldenGate-pinned rather than oracle-backed (the q_plogo
    * precedent).
    */
  def compressionSignals(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__z", deflateUdf(col(textCol)))
      .withColumn("n_raw_bytes", col("__z._1"))
      .withColumn("n_deflate_bytes", col("__z._2"))
      .withColumn("deflate_ratio",
        round(col("__z._2").cast("double") /
          greatest(col("__z._1"), lit(1)).cast("double"), 6))
      .drop("__z")
}
