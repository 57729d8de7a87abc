package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Destructive text-cleaning operators for pre-training corpora: PII
  * scrubbing and C4-style line filtering (Raffel et al. 2020, the C4
  * appendix rules; Dolma and RefinedWeb run the same shapes). Both are
  * stateless per-row column transforms — map-only at any scale, no
  * shuffle, whole-stage-codegen'd regex/array kernels — and exact, so the
  * driver oracle hash-checks them end to end.
  *
  * Regexes deliberately use the common subset of Java regex and RE2
  * (no lookarounds, no possessive quantifiers) so the DuckDB oracle runs
  * the very same patterns.
  */
object TextCleanse {

  /** `[EMAIL]` / `[PHONE]` / `[IP]` replacement patterns. Intentionally
    * high-recall/simple — the standard corpus-scrub tradeoff (a few false
    * positives beat leaked contact data in a trained model).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  // international-ish phone: +cc or digit start, then 7+ of digit/space/()/-
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** `text` with emails, IPs, then phone-shaped runs replaced by typed
    * placeholder tokens. Order matters: emails can contain digit runs and
    * IPs are phone-shaped, so the more specific patterns scrub first.
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val noIp = regexp_replace(noEmail, IpRe, "[IP]")
    regexp_replace(noIp, PhoneRe, "[PHONE]")
  }

  /** Per-document scrub accounting: the cleaned text plus how many of
    * each PII class were replaced (pipeline dashboards track these rates;
    * a spike is a crawl-quality alarm).
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    def hits(re: String): Column =
      size(regexp_extract_all(col(textCol), lit(re), lit(0)))
    // email hits count first, then ips on the email-scrubbed text, then
    // phones on the ip-scrubbed text — mirrors the replacement cascade so
    // counts agree with what scrubPii actually replaced
    val noEmail = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    val noIp = regexp_replace(noEmail, IpRe, "[IP]")
    df.withColumn("n_emails", hits(EmailRe))
      .withColumn("n_ips", size(regexp_extract_all(noEmail, lit(IpRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(noIp, lit(PhoneRe), lit(0))))
      .withColumn(textCol, scrubPii(col(textCol)))
  }

  /** C4's terminal-punctuation rule set, per line: keep a line iff it has
    * at least `minWords` whitespace words, ends in . ! ? or a closing
    * quote after one of those, and carries none of the boilerplate
    * markers (javascript/cookie/lorem ipsum/curly brace).
    */
  def keepLine(line: Column, minWords: Int = 4): Column = {
    val words = size(filter(split(trim(line), "\\s+"), t => length(t) > 0))
    val terminal = trim(line).rlike("[.!?][\"']?$")
    val lower = lowerCaseMarkersFree(line)
    words >= minWords && terminal && lower
  }

  private def lowerCaseMarkersFree(line: Column): Column = {
    val l = lower(line)
    !l.contains("javascript") && !l.contains("cookie") &&
      !l.contains("lorem ipsum") && !l.contains("{")
  }

  /** C4-style line filtering: `textCol` rebuilt from only the lines
    * [[keepLine]] accepts, plus kept/dropped line counts. Documents whose
    * every line drops come out with empty text (downstream length filters
    * — gopherFilter — remove them); the accounting keeps that visible.
    */
  def c4LineFilter(df: DataFrame, textCol: String, minWords: Int = 4): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => keepLine(l, minWords))
    df.withColumn("n_lines", size(lines))
      .withColumn("n_lines_kept", size(kept))
      .withColumn(textCol, concat_ws("\n", kept))
  }

  // ---- Unicode normalization (UAX #15) --------------------------------
  // Web crawl text mixes precomposed and combining-mark encodings of the
  // same glyphs; every hash-keyed operator upstream (shingles, grams,
  // segments, exact windows) treats them as DIFFERENT bytes, so corpora
  // are NFC-normalized before dedup (CCNet normalizes before hashing).
  // Kernels are java.text.Normalizer (the JDK's UAX #15 implementation);
  // DuckDB's nfc_normalize/strip_accents implement the same standard,
  // which the driver oracle exercises on genuinely non-ASCII input
  // (q_unicode_nfc injects combining marks on both sides and checks the
  // compose→strip round-trip) — cross-engine normalization parity is a
  // gate row, not an assumption. Map-only, streaming-safe.

  /** NFC (canonical composition) of `textCol`. */
  def nfcNormalize(textCol: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(textCol)
  }

  /** NFKC (compatibility composition — also folds ligatures, full-width
    * forms, superscripts): the aggressive variant used before
    * tokenization in many pipelines.
    */
  def nfkcNormalize(textCol: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
    f(textCol)
  }

  /** Accent stripping: NFD decomposition, then all combining marks
    * (\p{M}) removed. `é → e`, `ü → u`; base letters without canonical
    * decompositions (`ø`, `ß`) pass through — same contract as DuckDB's
    * `strip_accents`.
    */
  def stripAccents(textCol: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", ""))
    f(textCol)
  }

  /** Curated homoglyph table (the UTS #39 confusables idea, re-typed
    * BMP subset): Cyrillic/Greek look-alikes fold onto their Latin
    * skeleton, typographic quotes/dashes/NBSP onto ASCII, and
    * zero-width characters (the classic dedup-evasion trick) DROP —
    * translate() removes source chars with no target in both Spark and
    * DuckDB. Order: from(i) maps to to(i); the zero-width tail has no
    * targets.
    */
  val ConfusablesFrom: String =
    "\u0430\u0435\u043E\u0440\u0441\u0445\u0443\u0456\u0455\u0458" + // cyr lower a e o p c x y i s j
      "\u0410\u0412\u0415\u041A\u041C\u041D\u041E\u0420\u0421\u0422\u0425" + // cyr upper A B E K M H O P C T X
      "\u03BF\u03BD\u0391\u0392\u0395\u0396\u0397\u0399\u039A\u039C\u039D\u039F\u03A1\u03A4\u03A5\u03A7" + // greek o v A B E Z H I K M N O P T Y X
      "\u2019\u2018\u201C\u201D\u2014\u2013\u2012\u00A0" + // ' ' " " em/en/figure dash -> '-', nbsp -> space
      "\u200B\u200C\u200D\uFEFF" // zero-width space/joiners/BOM: dropped
  val ConfusablesTo: String =
    "aeopcxyisj" + "ABEKMHOPCTX" + "ovABEZHIKMNOPTYX" + "''" + "\"\"" + "--- "

  /** Homoglyph skeleton fold: one builtin translate(), map-only. Run it
    * before any content-hash/shingle dedup key so visually-identical
    * spam mirrors (Cyrillic-а substitutions, zero-width padding)
    * collide instead of slipping past.
    */
  def skeleton(textCol: Column): Column =
    translate(textCol, ConfusablesFrom, ConfusablesTo)

  /** The identical fold as a DuckDB expression over `innerExpr`, both
    * character tables spelled as chr() chains so the oracle string
    * stays ASCII and quote-escaping-free.
    */
  def skeletonOracleSql(innerExpr: String): String = {
    def chain(s: String) = s.map(c => s"chr(${c.toInt})").mkString(" || ")
    s"translate($innerExpr, ${chain(ConfusablesFrom)}, ${chain(ConfusablesTo)})"
  }
}
