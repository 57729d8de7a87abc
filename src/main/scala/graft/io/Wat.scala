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
    * then the three control characters anchor text can realistically
    * carry (tab, LF, CR — RFC 8259 requires them escaped; unescaped
    * they make the record unparseable and a PERMISSIVE from_json
    * silently drops it). The remaining C0 controls are exotic in
    * extracted anchors and are NORMALIZED AWAY rather than escaped —
    * documented lossy, never invalid. Order matters: the backslash
    * fold must run first or it would double-escape the others.
    */
  private def esc(c: Column): Column =
    regexp_replace(
      replace(replace(replace(replace(replace(
        c,
        lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")),
        lit("\t"), lit("\\t")),
        lit("\n"), lit("\\n")),
        lit("\r"), lit("\\r")),
      "[\\x00-\\x1f]", "")

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
