package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WAT metadata-record payload construction — the third member of the
  * CommonCrawl WARC/WET/WAT triple: per response record, a `metadata`
  * WARC record (ISO 28500, `WARC-Refers-To` back-pointer) whose payload
  * is a deterministic JSON envelope carrying the parsed wire facts plus
  * the page's extracted outlink/anchor set.
  *
  * The JSON is built by explicit concatenation of pure built-in
  * expressions (not `to_json`) so the byte layout is engine-stable —
  * field order, spacing, and escaping are pinned here and restated by
  * the DuckDB oracle character for character. Map-only, codegen'd,
  * rides the archive scan; at 100 TB the WAT leg adds zero shuffles to
  * the WARC factory.
  */
object Wat {

  /** JSON string escaper: backslash and quote (the structural pair),
    * then tab/LF/CR with their short escapes, then EVERY remaining C0
    * control as `\u00XX` (RFC 8259 §7 requires all of U+0000–U+001F
    * escaped; unescaped they make the record unparseable, and a
    * PERMISSIVE from_json silently drops it). Byte-faithful: a hostile
    * anchor carrying \x01 round-trips through the sidecar losslessly —
    * WatSpec pins write → from_json == original. Order matters: the
    * backslash fold must run first or it would double-escape the
    * others; the per-character folds are pure built-in `replace`s, so
    * the layout stays engine-stable and oracle-restatable.
    */
  private def esc(c: Column): Column = {
    val shortEscaped = replace(replace(replace(replace(replace(
      c,
      lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\"")),
      lit("\t"), lit("\\t")),
      lit("\n"), lit("\\n")),
      lit("\r"), lit("\\r"))
    // the 29 C0 controls without a short escape -> \u00XX
    (0x00 to 0x1f).filterNot(Set(0x09, 0x0a, 0x0d)).foldLeft(shortEscaped) {
      (acc, cp) =>
        replace(acc, lit(cp.toChar.toString), lit(f"\\u$cp%04x"))
    }
  }

  /** `{"envelope":{"status":S,"content_type":"CT","content_length":N},
    *   "links":[{"href":"H","text":"T"},...]}`
    * hrefs/texts must be positionally aligned arrays (the
    * [[graft.ops.LinkGraph.pairHrefs]]/[[graft.ops.LinkGraph.pairTexts]]
    * contract: both extract from the same match set).
    */
  def payload(status: Column, contentType: Column, contentLength: Column,
      hrefs: Column, texts: Column): Column =
    concat(
      lit("{\"envelope\":{\"status\":"), status.cast("string"),
      lit(",\"content_type\":\""), esc(contentType),
      lit("\",\"content_length\":"), contentLength.cast("string"),
      lit("},\"links\":["),
      array_join(zip_with(hrefs, texts, (h, t) =>
        concat(lit("{\"href\":\""), esc(h),
          lit("\",\"text\":\""), esc(t), lit("\"}"))), ","),
      lit("]}"))
}
