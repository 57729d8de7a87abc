package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the WAT JSON payload builder: the escaping contract must
  * survive a from_json round trip for every string that can reach a
  * record — quotes, backslashes and whitespace controls in hrefs or
  * anchor text (anchor text is EXTRACTED CONTENT; the WARC writer's
  * header-injection guard protects headers, not payload strings, so
  * the escaper is the only line of defense against an unparseable
  * record that PERMISSIVE from_json would silently drop).
  */
class WatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val watSchema = "struct<envelope: struct<status: int, " +
    "content_type: string, content_length: bigint>, " +
    "links: array<struct<href: string, text: string>>>"

  private def roundTrip(rows: Seq[(String, String)]): Seq[(String, String)] = {
    val df = Seq((rows.map(_._1), rows.map(_._2)))
      .toDF("hrefs", "texts")
      .select(Wat.payload(lit(200), lit("text/html"), lit(10L),
        col("hrefs"), col("texts")).as("j"))
    val parsed = df.select(
      from_json(col("j"), watSchema, Map.empty[String, String]).as("w"))
      .select(explode(col("w.links")).as("l"))
      .select(col("l.href"), col("l.text"))
      .as[(String, String)].collect().toSeq
    // the JSON itself must also have parsed (PERMISSIVE from_json
    // yields a null struct on bad JSON -> zero links)
    assert(parsed.length == rows.length,
      s"record dropped: ${df.as[String].collect().head}")
    parsed
  }

  test("plain strings round-trip untouched") {
    assert(roundTrip(Seq(("https://a/x", "plain anchor"))) ==
      Seq(("https://a/x", "plain anchor")))
  }

  test("quotes and backslashes escape and round-trip exactly") {
    val hostile = Seq(
      ("https://a/?q=\"quoted\"", "he said \"hi\""),
      ("https://a/\\back\\slash", "a\\b\\\\c"),
      ("https://a/mix\\\"", "\\\"both\\\""))
    assert(roundTrip(hostile) == hostile)
  }

  test("tab/LF/CR in anchor text escape and round-trip; exotic C0 escape losslessly") {
    val ws = Seq(("https://a/1", "tab\there"), ("https://a/2", "line\nbreak"),
      ("https://a/3", "car\rreturn"))
    assert(roundTrip(ws) == ws)
    // every exotic C0 control is \u00XX-escaped, BYTE-FAITHFUL: the
    // sidecar must agree with a raw-byte extractor, not normalize
    val exotic = (0x00 to 0x1f).filterNot(Set(0x09, 0x0a, 0x0d)).map { cp =>
      (s"https://a/$cp", s"a${cp.toChar}b")
    }
    assert(roundTrip(exotic) == exotic)
    // and the escape is the RFC 8259 spelling, visible in the raw JSON
    val raw = Seq((Seq("https://a/4"), Seq("ab")))
      .toDF("hrefs", "texts")
      .select(Wat.payload(lit(200), lit("text/html"), lit(10L),
        col("hrefs"), col("texts")).as("j"))
      .as[String].collect().head
    assert(raw.contains("a\\u0001b"), raw)
    assert(!raw.exists(c => c < ' '), "raw control leaked into the JSON")
  }

  test("envelope fields survive alongside hostile links") {
    val df = Seq((Seq("https://a/\"x"), Seq("t\tt")))
      .toDF("hrefs", "texts")
      .select(Wat.payload(lit(301), lit("text/html; charset=\"utf-8\""),
        lit(42L), col("hrefs"), col("texts")).as("j"))
      .select(from_json(col("j"), watSchema, Map.empty[String, String]).as("w"))
      .select(col("w.envelope.status"), col("w.envelope.content_type"),
        col("w.envelope.content_length"))
      .as[(Int, String, Long)].collect().head
    assert(df == ((301, "text/html; charset=\"utf-8\"", 42L)))
  }
}
