package graft.io

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP/1.x response parsing + charset decoding — the hop between a
  * WARC `response` record's BINARY payload ([[Warc.read]]) and the
  * string-typed HTML the text operators consume
  * ([[graft.ops.HtmlExtract]]). A CommonCrawl response payload is the
  * raw wire bytes: status line, header lines, blank line, entity body
  * in whatever encoding the origin server chose — so real crawl ingest
  * needs exactly two kernels:
  *
  *   - [[split]]: payload → (status, headers MAP, body BINARY), a
  *     structural parse of RFC 9112 framing (tolerant of bare-LF line
  *     endings, which real servers emit);
  *   - [[decodeBody]]: body + Content-Type → STRING via the published
  *     WHATWG-encoding precedence: charset parameter in Content-Type →
  *     `<meta>` declaration sniffed from the first bytes → BOM →
  *     UTF-8-validity check → windows-1252 fallback (the WHATWG
  *     default for the web; ISO-8859-1/latin1/ascii labels alias to it
  *     per the encoding spec, because that is what real pages mean).
  *
  * Both are typed UDFs: byte-level framing and charset decode have no
  * built-in Column expression. Each is map-only, one compiled pass per
  * row, no shuffle — at 100 TB they ride in the scan's task alongside
  * the WARC record walk. No reference counterpart
  * (cchrysostomou/seqtables has no web layer); §2.12 mandate.
  */
object Http {

  /** Structural parse result. `status == -1` flags a payload that does
    * not start with an HTTP status line — headers empty, body = the
    * whole payload, so the function is total and a mixed corpus never
    * throws.
    */
  final case class Parsed(
      status: Int,
      headers: Map[String, String],
      body: Array[Byte])

  /** Parse wire bytes: `HTTP/1.x <code> <reason>` status line, header
    * lines to the first blank line, body = everything after. Header
    * names lower-case; repeated headers join with ", " (RFC 9110 §5.3
    * list semantics). Lines end CRLF or bare LF.
    */
  def parse(payload: Array[Byte]): Parsed = {
    if (payload == null) return Parsed(-1, Map.empty, Array.emptyByteArray)
    if (!startsWithHttp(payload)) return Parsed(-1, Map.empty, payload)
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      val end =
        if (pos > start && payload(pos - 1) == '\r') pos - 1 else pos
      if (pos < payload.length) pos += 1 // consume the LF
      new String(payload, start, end - start, StandardCharsets.ISO_8859_1)
    }
    val statusLine = readLine()
    val parts = statusLine.split(" ", 3)
    val status =
      if (parts.length >= 2) parts(1).takeWhile(_.isDigit) match {
        case "" => -1
        case d if d.length <= 3 => d.toInt
        case _ => -1
      }
      else -1
    if (status < 0) return Parsed(-1, Map.empty, payload)
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var line = readLine()
    while (line.nonEmpty && pos <= payload.length) {
      val colon = line.indexOf(':')
      if (colon > 0) {
        val k = line.substring(0, colon).trim.toLowerCase
        val v = line.substring(colon + 1).trim
        headers(k) = headers.get(k).map(_ + ", " + v).getOrElse(v)
      }
      // a malformed header line is skipped, not fatal — crawled servers
      // emit garbage and the body is still worth having
      if (pos >= payload.length) line = "" else line = readLine()
    }
    Parsed(status, headers.toMap, java.util.Arrays.copyOfRange(payload, pos, payload.length))
  }

  private def startsWithHttp(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 'H' && b(1) == 'T' && b(2) == 'T' &&
      b(3) == 'P' && b(4) == '/'

  /** WHATWG label → JVM charset. The spec folds the latin-1 family into
    * windows-1252 (what pages labelled iso-8859-1 actually contain);
    * labels the JVM knows pass through; unknown labels yield None so
    * the caller falls to content sniffing.
    */
  private[io] def charsetForLabel(label: String): Option[Charset] = {
    val l = label.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"")
    if (l.isEmpty) None
    else l match {
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "ascii" |
          "us-ascii" | "windows-1252" | "cp1252" | "x-cp1252" |
          "iso_8859-1" | "l1" =>
        Some(Charset.forName("windows-1252"))
      case "utf8" | "utf-8" | "unicode-1-1-utf-8" =>
        Some(StandardCharsets.UTF_8)
      case other =>
        try { if (Charset.isSupported(other)) Some(Charset.forName(other)) else None }
        catch { case _: IllegalArgumentException => None }
    }
  }

  private val CharsetParamRe =
    java.util.regex.Pattern.compile(
      "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:+-]+)\"?")

  /** charset parameter of a Content-Type value, if present and known. */
  private[io] def charsetFromContentType(ct: String): Option[Charset] = {
    if (ct == null) return None
    val m = CharsetParamRe.matcher(ct)
    if (m.find()) charsetForLabel(m.group(1)) else None
  }

  /** How many body bytes the `<meta>` sniff inspects — the WHATWG
    * prescan bound (1024 bytes).
    */
  val MetaSniffBytes: Int = 1024

  private val MetaCharsetRe =
    java.util.regex.Pattern.compile(
      "(?is)<meta[^>]*?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+-]+)")

  /** `<meta charset=...>` / `<meta http-equiv=Content-Type content=
    * "...charset=...">` sniff over the first [[MetaSniffBytes]] of the
    * body, read as ISO-8859-1 (ASCII-compatible superset — every
    * candidate encoding for a meta tag is ASCII-transparent there).
    */
  private[io] def charsetFromMeta(body: Array[Byte]): Option[Charset] = {
    if (body == null || body.length == 0) return None
    val head = new String(body, 0, math.min(body.length, MetaSniffBytes),
      StandardCharsets.ISO_8859_1)
    val m = MetaCharsetRe.matcher(head)
    if (m.find()) charsetForLabel(m.group(1)) else None
  }

  /** Strict UTF-8 validation (no decode output — a single pass). */
  private[io] def isValidUtf8(body: Array[Byte]): Boolean = {
    var i = 0
    val n = body.length
    while (i < n) {
      val b = body(i) & 0xff
      if (b < 0x80) i += 1
      else {
        val (len, min) =
          if (b >= 0xc2 && b <= 0xdf) (2, 0x80)
          else if (b >= 0xe0 && b <= 0xef) (3, 0x800)
          else if (b >= 0xf0 && b <= 0xf4) (4, 0x10000)
          else return false
        if (i + len > n) return false
        var cp = b & (0xff >> (len + 1))
        var j = 1
        while (j < len) {
          val c = body(i + j) & 0xff
          if ((c & 0xc0) != 0x80) return false
          cp = (cp << 6) | (c & 0x3f)
          j += 1
        }
        if (cp < min || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff))
          return false
        i += len
      }
    }
    true
  }

  /** Decode an entity body per the published precedence:
    * Content-Type charset → meta sniff → BOM → UTF-8 validity →
    * windows-1252. Decoding never throws: unmappable input replaces
    * (CodingErrorAction.REPLACE), matching browser behavior — a crawl
    * pipeline must not die on one mojibake page.
    */
  def decode(body: Array[Byte], contentType: String): String = {
    if (body == null) return null
    val cs = charsetFromContentType(contentType)
      .orElse(charsetFromMeta(body))
      .getOrElse {
        if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
          StandardCharsets.UTF_8
        else if (isValidUtf8(body)) StandardCharsets.UTF_8
        else Charset.forName("windows-1252")
      }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(body)).toString
    // a decoded UTF-8 BOM renders as U+FEFF; strip it — it is framing,
    // not content
    if (out.nonEmpty && out.charAt(0) == '\ufeff') out.substring(1) else out
  }

  // -------------------------------------------------------------------
  // Column forms
  // -------------------------------------------------------------------

  /** `payload BINARY` → `struct(status INT, headers MAP<STRING,STRING>,
    * body BINARY)`.
    */
  def split(payload: Column): Column = {
    val f = udf((p: Array[Byte]) => {
      val r = parse(p)
      (r.status, r.headers, r.body)
    })
    f(payload).cast(
      "struct<status:int,headers:map<string,string>,body:binary>")
  }

  /** `body BINARY`, `contentType STRING` → decoded STRING. */
  def decodeBody(body: Column, contentType: Column): Column = {
    val f = udf((b: Array[Byte], ct: String) => decode(b, ct))
    f(body, contentType)
  }

  /** Build response wire bytes — the writer twin used by round-trip
    * gates and WARC fixture generation: status line, given headers in
    * order, blank line, body encoded with `charset`
    * ([[charsetForLabel]] semantics; unmappable characters replace).
    */
  def encodeResponse(
      status: Int,
      headers: Seq[(String, String)],
      bodyText: String,
      charset: String): Array[Byte] = {
    val cs = charsetForLabel(charset).getOrElse(StandardCharsets.UTF_8)
    val enc = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bodyBuf = enc.encode(java.nio.CharBuffer.wrap(bodyText))
    val body = new Array[Byte](bodyBuf.remaining())
    bodyBuf.get(body)
    val head = new StringBuilder()
      .append("HTTP/1.1 ").append(status).append(' ')
      .append(if (status == 200) "OK" else "Status").append("\r\n")
    headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append("\r\n") }
    head.append("\r\n")
    val hb = head.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }

  /** Column form of [[encodeResponse]] for derivation pipelines:
    * `(status, contentTypeValue, bodyText, charsetLabel)` → BINARY.
    * Emits Content-Type plus an `X-Doc` provenance header when
    * `xDoc` is non-null.
    */
  def encodeResponseCol(
      status: Column,
      contentType: Column,
      bodyText: Column,
      charset: Column,
      xDoc: Column): Column = {
    val f = udf((st: Int, ct: String, body: String, cs: String, xd: String) =>
      encodeResponse(st,
        Seq("Content-Type" -> ct) ++
          (if (xd == null) Seq.empty else Seq("X-Doc" -> xd)) ++
          Seq("Connection" -> "close"),
        body, cs))
    f(status, contentType, bodyText, charset, xDoc)
  }
}
