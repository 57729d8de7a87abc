package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the hop between a WARC payload and the
  * text-quality operators ([[TextAnalysis]], [[TextCleanse]], the Gopher
  * family). Tag-strip plus line-level boilerplate removal in the style of
  * the published jusText / trafilatura heuristics: a candidate "line" is
  * the text between block-level tags, and a line survives when it is long
  * enough, is not mostly link text (link density), and carries at least
  * one stopword (function-word density — boilerplate like nav bars,
  * copyright lines and share buttons fails one of the three).
  *
  * No reference counterpart (cchrysostomou/seqtables has no web layer);
  * part of the §2.12 training-data-pipeline mandate, closing the
  * round-8 "missing link" between `io.Warc` and the text operators.
  *
  * Everything is a pure built-in Column expression — regexp_replace /
  * split / filter / transform, no UDF — so extraction is map-only,
  * rides inside WholeStageCodegen, and every rule has an exact DuckDB
  * twin (regexp_replace 'g', string_split, list_filter) for the
  * cross-engine oracle (q_html_extract). Regexes are written to the RE2
  * subset (no backreferences, no lookaround) so both engines compile
  * the same pattern.
  *
  * Honest scope: this is a heuristic extractor, not an HTML5 parser —
  * no entity table beyond the six below, no CDATA, no nested-comment
  * pathology. That is also true of the production heuristics it
  * follows; a crawl pipeline tunes the thresholds per corpus.
  */
object HtmlExtract {

  /** Default stopword list: the union of [[TextAnalysis.MarkerWords]] —
    * the same function-word set the quality score uses, so "has a
    * stopword" means the same thing across the pipeline.
    */
  val DefaultStopwords: Seq[String] = TextAnalysis.MarkerWords.flatMap(_._2).distinct

  /** Tags whose open OR close marks a line (block) boundary. Exposed to
    * the query layer so the DuckDB oracle inlines the SAME alternation —
    * a drift in the tag set fails the gate loudly.
    */
  private[graft] val BlockTags =
    "p|div|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|section|article|" +
      "header|footer|nav|aside|blockquote|title|head|body|html|pre|form"

  /** Structural pass: drop script/style bodies and comments entirely
    * (their text is never content — a script may even contain tag-like
    * strings, which is why this runs BEFORE any tag handling), then turn
    * block-tag boundaries and `<br>` into newlines. Inline tags (`<a>`,
    * `<b>`, `<span>`…) are left in place — the line filters need anchors
    * intact to measure link density.
    */
  def structuralLines(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment, s"(?i)<br[^>]*>|</?($BlockTags)[^>]*>", "\n")
  }

  /** The six entities every escaper emits; `&amp;` decodes LAST so
    * double-escaped text (`&amp;lt;`) correctly yields the literal
    * `&lt;`, not `<`.
    */
  def decodeEntities(s: Column): Column = {
    val steps = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    steps.foldLeft(s) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Numeric character references — `&#8217;` and `&#x2019;` — decoded
    * to their BMP code point; surrogates, out-of-range values and
    * malformed references stay literal. A tiny typed UDF: converting a
    * captured digit run to its character has no built-in expression
    * (Spark's `chr` is mod-256 ASCII), and the per-row work is a single
    * compiled-regex pass. Deterministic, null-safe.
    */
  private[graft] def decodeNumericRefsStr(s: String): String = {
    if (s == null || s.indexOf("&#") < 0) return s
    val m = NumericRefRe.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    while (m.find()) {
      val cp =
        try {
          if (m.group(1) != null) Integer.parseInt(m.group(1))
          else Integer.parseInt(m.group(2), 16)
        } catch { case _: NumberFormatException => -1 }
      val rep =
        if (cp >= 0x20 && cp <= 0xFFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          String.valueOf(cp.toChar)
        else m.group(0)
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  private val NumericRefRe =
    java.util.regex.Pattern.compile("&#(?:([0-9]{1,7})|[xX]([0-9a-fA-F]{1,6}));")

  /** Column form of [[decodeNumericRefsStr]]. */
  def decodeNumericRefs(s: Column): Column = {
    val f = udf((x: String) => decodeNumericRefsStr(x))
    f(s)
  }

  /** Full entity decode: the five non-`&amp;` named entities, then
    * numeric references, then `&amp;` — numeric decode runs BEFORE the
    * `&amp;` step for the same double-escape reason (`&amp;#39;` must
    * yield the literal `&#39;`, not an apostrophe).
    */
  def decodeEntitiesFull(s: Column): Column = {
    val named = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'")
    regexp_replace(
      decodeNumericRefs(
        named.foldLeft(s) { case (c, (from, to)) => regexp_replace(c, from, to) }),
      "&amp;", "&")
  }

  /** Rendered text of one line: strip remaining (inline) tags, decode
    * entities, collapse whitespace runs to one space, trim.
    */
  def visibleText(line: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(line, "<[^>]*>", " ")), "\\s+", " "))

  /** [[visibleText]] with the full entity decode (numeric references
    * included) — the render for pipelines whose corpus carries
    * `&#8217;`-class escapes. One UDF hop per line; everything else
    * stays built-in.
    */
  def visibleTextFull(line: Column): Column =
    trim(regexp_replace(
      decodeEntitiesFull(regexp_replace(line, "<[^>]*>", " ")), "\\s+", " "))

  /** Characters of the line's text that live inside `<a>` anchors —
    * the numerator of link density. Anchor inner texts are concatenated
    * with a space and rendered through the same `render` rules as the
    * denominator so the two are commensurable.
    */
  private def linkCharsWith(line: Column, render: Column => Column): Column =
    length(render(
      array_join(regexp_extract_all(line, lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)), " ")))

  def linkChars(line: Column): Column = linkCharsWith(line, visibleText)

  /** Stopword hits in an already-collapsed visible text. */
  private def stopwordHits(visible: Column, stopwords: Seq[String]): Column =
    size(filter(split(lower(visible), " "),
      w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** The surviving content lines of a document, in order. A line is
    * kept when ALL of:
    *   - `length(visible) >= minChars` (short lines are chrome:
    *     titles, copyright, timestamps);
    *   - `linkChars * 100 <= length(visible) * maxLinkDensityPct`
    *     (nav bars / share rows / link farms are mostly anchor text);
    *   - at least `minStopwords` stopword tokens (prose carries
    *     function words; keyword stuffing and menus do not). With a
    *     language-appropriate stopword list this is jusText's
    *     good-line rule; with the default English-leaning list,
    *     non-matching-language content is dropped — exactly how
    *     language-targeted crawl extraction behaves.
    */
  def contentLines(
      html: Column,
      minChars: Int = 25,
      maxLinkDensityPct: Int = 30,
      minStopwords: Int = 1,
      stopwords: Seq[String] = DefaultStopwords): Column =
    contentLinesWith(html, visibleText, minChars, maxLinkDensityPct,
      minStopwords, stopwords)

  /** [[contentLines]] with a pluggable line renderer. Each line is
    * rendered ONCE: the transform materializes
    * `struct(visible, link_chars)` per line, the filter reads the
    * struct fields (cheap projections, no re-render), and the final
    * projection emits the already-rendered text — the naive shape
    * re-ran the render regex chain four times per line.
    */
  private[graft] def contentLinesWith(
      html: Column,
      render: Column => Column,
      minChars: Int,
      maxLinkDensityPct: Int,
      minStopwords: Int,
      stopwords: Seq[String]): Column = {
    val lines = split(structuralLines(html), "\n")
    val scored = transform(lines, line =>
      struct(render(line).as("v"), linkCharsWith(line, render).as("lc")))
    val kept = filter(scored, s => {
      val v = s.getField("v")
      (length(v) >= minChars) &&
        (s.getField("lc") * 100 <= length(v) * maxLinkDensityPct) &&
        (stopwordHits(v, stopwords) >= minStopwords)
    })
    transform(kept, s => s.getField("v"))
  }

  /** Extracted main content: surviving lines joined with '\n' — the
    * input the text-quality operators consume downstream.
    */
  def extract(
      html: Column,
      minChars: Int = 25,
      maxLinkDensityPct: Int = 30,
      minStopwords: Int = 1,
      stopwords: Seq[String] = DefaultStopwords): Column =
    array_join(contentLines(html, minChars, maxLinkDensityPct, minStopwords,
      stopwords), "\n")

  /** [[extract]] with the full entity decode ([[visibleTextFull]] —
    * numeric character references included): the render for real crawl
    * payloads arriving through [[graft.io.Http]].
    */
  def extractFull(
      html: Column,
      minChars: Int = 25,
      maxLinkDensityPct: Int = 30,
      minStopwords: Int = 1,
      stopwords: Seq[String] = DefaultStopwords): Column =
    array_join(contentLinesWith(html, visibleTextFull, minChars,
      maxLinkDensityPct, minStopwords, stopwords), "\n")
}
