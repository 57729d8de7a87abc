package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-rule pins for the HTML main-content extractor. Corpus-level
  * behavior (and the DuckDB twin) is oracle-gated via q_html_extract /
  * q_web_pipeline; these pin the rules on hand-built pages the synthetic
  * derivation never produces.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String, minStopwords: Int = 1): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h"), minStopwords = minStopwords))
      .as[String].head()

  test("script/style/comment bodies are never content, even with tag-shaped strings") {
    val html = "<html><head><style>p { the and of to in is }</style>" +
      "<script>var t = \"</div><p>the fake content that is not real at all</p>\";</script>" +
      "<!-- the hidden comment that would otherwise pass every line rule here -->" +
      "</head><body><p>the real paragraph is long enough and carries stopwords</p></body></html>"
    assert(extract(html) === "the real paragraph is long enough and carries stopwords")
  }

  test("nav bars and share rows fail the link-density rule") {
    val html = "<body><nav><a href=/>the home page link</a> <a href=/b>the second link is long</a></nav>" +
      "<p>the content line that is long enough to pass and mostly not links " +
      "with one <a href=/x>small link</a> inside it</p></body>"
    assert(extract(html) ===
      "the content line that is long enough to pass and mostly not links with one small link inside it")
  }

  test("short lines (titles, copyright) fail the length rule") {
    val html = "<title>the Doc</title><p>the page c 2026</p>" +
      "<p>the surviving paragraph is comfortably past twenty-five characters</p>"
    assert(extract(html) ===
      "the surviving paragraph is comfortably past twenty-five characters")
  }

  test("stopword-free lines (menus, keyword stuffing) are dropped") {
    val html = "<p>keyword keyword keyword keyword keyword keyword keyword</p>" +
      "<p>the prose line which is long enough and has function words</p>"
    assert(extract(html) ===
      "the prose line which is long enough and has function words")
  }

  test("entities decode once; double-escaped text stays escaped") {
    val html = "<p>the a &lt; b case and the x &amp;lt; y case with &quot;quotes&quot; &#39;here&#39;&nbsp;end</p>"
    assert(extract(html) ===
      "the a < b case and the x &lt; y case with \"quotes\" 'here' end")
  }

  test("br and block tags both split lines; whitespace collapses") {
    val html = "<div>the first   line is long enough to pass all rules<br>" +
      "the second line is also long enough to pass all rules</div>"
    assert(extract(html) ===
      "the first line is long enough to pass all rules\n" +
        "the second line is also long enough to pass all rules")
  }

  test("empty extraction for pure-chrome pages") {
    val html = "<nav><a href=/>Home</a></nav><footer>c 2026</footer>"
    assert(extract(html) === "")
  }

  test("numeric character references decode (decimal, hex, bounds)") {
    assert(HtmlExtract.decodeNumericRefsStr("a&#8217;b") === "a’b")
    assert(HtmlExtract.decodeNumericRefsStr("a&#x2019;b") === "a’b")
    assert(HtmlExtract.decodeNumericRefsStr("a&#X20AC;b") === "a€b")
    assert(HtmlExtract.decodeNumericRefsStr("&#65;&#x41;") === "AA")
    // malformed / out-of-range / surrogate stay literal
    assert(HtmlExtract.decodeNumericRefsStr("&#;x") === "&#;x")
    assert(HtmlExtract.decodeNumericRefsStr("&#xD800;") === "&#xD800;")
    assert(HtmlExtract.decodeNumericRefsStr("&#1114112;") === "&#1114112;")
    assert(HtmlExtract.decodeNumericRefsStr("&#12 34;") === "&#12 34;")
    assert(HtmlExtract.decodeNumericRefsStr("no refs here") === "no refs here")
    assert(HtmlExtract.decodeNumericRefsStr(null) === null)
  }

  private def extractFull(html: String): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.extractFull(col("h")))
      .as[String].head()

  test("extractFull decodes numeric refs; plain extract leaves them literal") {
    val html = "<p>the writer&#8217;s page has the em&#x2013;dash and is long enough</p>"
    assert(extractFull(html) ===
      "the writer’s page has the em–dash and is long enough")
    assert(extract(html) ===
      "the writer&#8217;s page has the em&#x2013;dash and is long enough")
  }

  test("extractFull keeps the double-escape order: &amp;#39; stays literal") {
    val html = "<p>the raw token &amp;#39; must survive as text in this long line</p>"
    assert(extractFull(html) ===
      "the raw token &#39; must survive as text in this long line")
  }

  test("extract and extractFull agree on numeric-ref-free pages") {
    val html = "<body><nav><a href=/>the home page link</a></nav>" +
      "<p>the content line that is long enough to pass and mostly not links</p></body>"
    assert(extractFull(html) === extract(html))
  }
}
