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

  /** Minimal JSON string escaper — backslash then quote, the two
    * structural characters. Control characters would additionally need
    * \u00XX escapes per RFC 8259; crawl URLs/anchors that carry them
    * are rejected upstream by the WARC writer's header-injection guard,
    * so the two-character escape set is exact for everything that can
    * reach a record here.
    */
  private def esc(c: Column): Column =
    replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\""))

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
