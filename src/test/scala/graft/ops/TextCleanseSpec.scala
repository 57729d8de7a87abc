package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[TextCleanse]]: the PII scrub cascade (emails before IPs before
  * phones, counts agreeing with what was actually replaced) and the C4
  * line-filter rules. The driver oracle re-checks both end to end
  * (q_pii_scrub / q_c4_filter).
  */
class TextCleanseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scrubRow(text: String): (String, Int, Int, Int) = {
    val r = TextCleanse.piiScrub(Seq(Tuple1(text)).toDF("text"), "text")
      .select("text", "n_emails", "n_ips", "n_phones").head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("piiScrub replaces each class with its typed placeholder") {
    val (t, e, i, p) = scrubRow(
      "mail bob.smith+x@example.co.uk from 10.0.0.1 or call +1 (555) 123-4567 now")
    assert(t == "mail [EMAIL] from [IP] or call [PHONE] now")
    assert((e, i, p) == ((1, 1, 1)))
  }

  test("cascade order: email hostnames are not re-counted as phones/IPs") {
    // the digits-and-dots tail of an email must not surface as an IP hit,
    // and a scrubbed [IP] must not count again as a phone
    val (t, e, i, p) = scrubRow("x@4.2.168.192.in-addr.arpa and 192.168.2.4")
    assert(t == "[EMAIL] and [IP]")
    assert((e, i, p) == ((1, 1, 0)))
  }

  test("phone matching wants 9+ total digits-ish chars, not any number") {
    val (t, _, _, p) = scrubRow("year 2024 and id 12345 stay; 555-123-4567 goes")
    assert(t == "year 2024 and id 12345 stay; [PHONE] goes")
    assert(p == 1)
  }

  test("clean text passes through untouched with zero counts") {
    val (t, e, i, p) = scrubRow("no contact data at all here.")
    assert(t == "no contact data at all here.")
    assert((e, i, p) == ((0, 0, 0)))
  }

  test("nfcNormalize composes combining marks; idempotent on composed text") {
    import spark.implicits._
    val decomposed = "e\u0301te\u0301" // e + combining acute, twice
    val composed = "\u00e9t\u00e9"
    val got = Seq(Tuple1(decomposed)).toDF("text")
      .select(TextCleanse.nfcNormalize(col("text")).as("n"))
      .head().getString(0)
    assert(got == composed)
    val again = Seq(Tuple1(got)).toDF("text")
      .select(TextCleanse.nfcNormalize(col("text")).as("n"))
      .head().getString(0)
    assert(again == composed)
  }

  test("nfkcNormalize also folds compatibility forms") {
    import spark.implicits._
    // fi-ligature U+FB01 and circled one U+2460
    val got = Seq(Tuple1("\ufb01le \u2460")).toDF("text")
      .select(TextCleanse.nfkcNormalize(col("text")).as("n"))
      .head().getString(0)
    assert(got == "file 1")
  }

  test("stripAccents removes marks, keeps undecomposable base letters") {
    import spark.implicits._
    // creme/brulee/uber precomposed; o-slash and sharp-s have no
    // canonical decomposition and must survive
    val in = "cr\u00e8me br\u00fbl\u00e9e \u00fcber \u00f8 stra\u00dfe"
    val got = Seq(Tuple1(in)).toDF("text")
      .select(TextCleanse.stripAccents(col("text")).as("n"))
      .head().getString(0)
    assert(got == "creme brulee uber \u00f8 stra\u00dfe")
  }


  test("c4LineFilter keeps terminal-punctuated >=4-word lines, drops boilerplate") {
    val doc = Seq(
      "This is a proper sentence.",        // keep
      "Too short.",                        // drop: < 4 words
      "No terminal punctuation here",      // drop: no . ! ?
      "Enable javascript to view this page.", // drop: boilerplate marker
      "He said \"stop right there!\"",     // keep: quote after !
      "if (x) { return; }"                 // drop: curly brace
    ).mkString("\n")
    val r = TextCleanse.c4LineFilter(Seq((1L, doc)).toDF("doc_id", "text"), "text")
      .select("text", "n_lines", "n_lines_kept").head()
    assert(r.getString(0) ==
      "This is a proper sentence.\nHe said \"stop right there!\"")
    assert(r.getInt(1) == 6 && r.getInt(2) == 2)
  }

  test("c4LineFilter: a fully-boilerplate document keeps empty text, visible counts") {
    val r = TextCleanse.c4LineFilter(
      Seq((1L, "cookie banner\nshort")).toDF("doc_id", "text"), "text")
      .select("text", "n_lines", "n_lines_kept").head()
    assert(r.getString(0) == "")
    assert(r.getInt(1) == 2 && r.getInt(2) == 0)
  }

  test("skeleton: homoglyphs fold, zero-width drops, table is aligned") {
    // the mapping table itself: every from-char with a target, zero-width
    // tail dropped
    assert(TextCleanse.ConfusablesFrom.length ==
      TextCleanse.ConfusablesTo.length + 4)
    assert(TextCleanse.ConfusablesFrom.distinct == TextCleanse.ConfusablesFrom)
    val rows = Seq(
      (1L, "p\u0430yp\u0430l.com"),                       // cyrillic 'a'
      (2L, "he\u200Bllo\u200D world\uFEFF"),              // zero-width padding
      (3L, "\u201Csm\u03BFrt\u201D \u2014 d\u0430sh"),   // curly quotes, greek o, em dash
      (4L, "plain ascii stays")).toDF("doc_id", "text")
    val got = TextCleanse.skeleton(
      org.apache.spark.sql.functions.col("text"))
    val out = rows.select(org.apache.spark.sql.functions.col("doc_id"), got.as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "paypal.com")
    assert(out(2L) == "hello world")
    assert(out(3L) == "\"smort\" - dash")
    assert(out(4L) == "plain ascii stays")
    // two visually-identical spellings now share a dedup key
    val a = TextCleanse.skeleton(
      org.apache.spark.sql.functions.lit("sp\u0430m mirror\u200B"))
    val b = TextCleanse.skeleton(org.apache.spark.sql.functions.lit("spam mirror"))
    assert(rows.select(a === b).head().getBoolean(0))
  }
}
