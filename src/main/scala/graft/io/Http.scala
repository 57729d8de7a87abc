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
  *     WHATWG-encoding precedence: BOM sniff (wins over everything) →
  *     charset parameter in Content-Type → `<meta>` declaration
  *     sniffed from the first bytes → UTF-8-validity check →
  *     windows-1252 fallback (the WHATWG default for the web;
  *     ISO-8859-1/latin1/ascii labels alias to it per the encoding
  *     spec, because that is what real pages mean).
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

  /** Undo the wire encodings a crawled response body may carry, in
    * wire order: `Transfer-Encoding: chunked` de-chunking (RFC 9112
    * §7.1 — size-line in hex, chunk bytes, CRLF, zero-size terminator,
    * optional trailers), then `Content-Encoding: gzip|x-gzip|deflate`
    * decompression (deflate accepts both zlib-wrapped and raw streams,
    * the historic server split). Anything malformed returns the bytes
    * as far as they decoded soundly — crawl pipelines keep truncated
    * pages rather than dropping them (the CDX convention). Bounded by
    * `maxBytes` against decompression bombs: loud IllegalStateException
    * past the cap, never a silent OOM.
    */
  def decodeTransfer(
      body: Array[Byte],
      transferEncoding: String,
      contentEncoding: String,
      maxBytes: Int = 512 * 1024 * 1024): Array[Byte] = {
    if (body == null) return null
    val chunked = transferEncoding != null &&
      transferEncoding.toLowerCase.contains("chunked")
    val dechunked = if (chunked) dechunk(body) else body
    val ce = if (contentEncoding == null) "" else contentEncoding.trim.toLowerCase
    ce match {
      case "gzip" | "x-gzip" => gunzip(dechunked, maxBytes)
      case "deflate" => inflate(dechunked, maxBytes)
      case _ => dechunked
    }
  }

  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    var ok = true
    while (ok && pos < b.length) {
      // size line: hex digits up to ';' (chunk extension) or CR/LF
      var i = pos
      var size = 0L
      var any = false
      var bad = false
      while (i < b.length && b(i) != '\r' && b(i) != '\n' && b(i) != ';' && !bad) {
        val c = b(i)
        val d = Character.digit(c.toChar, 16)
        if (d < 0) bad = true
        else { size = size * 16 + d; any = true; i += 1 }
      }
      while (i < b.length && b(i) != '\n') i += 1 // rest of size line
      i += 1 // the LF
      if (bad || !any || size > Int.MaxValue || i > b.length) ok = false
      else if (size == 0) { ok = false } // terminator (trailers ignored)
      else if (i + size > b.length) { // truncated chunk: keep what exists
        out.write(b, i, b.length - i)
        ok = false
      } else {
        out.write(b, i, size.toInt)
        pos = i + size.toInt
        // consume the CRLF after the chunk data
        if (pos < b.length && b(pos) == '\r') pos += 1
        if (pos < b.length && b(pos) == '\n') pos += 1
      }
    }
    out.toByteArray
  }

  private def gunzip(b: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    drain(in, b.length * 4, maxBytes)
  }

  private def inflate(b: Array[Byte], maxBytes: Int): Array[Byte] = {
    // "deflate" historically means zlib-wrapped (the spec) OR raw
    // deflate (what many servers actually send). Decide by the zlib
    // header test — CM == 8 and the CMF/FLG big-endian pair divisible
    // by 31 (RFC 1950) — and fall back to the other framing if the
    // preferred one yields nothing.
    def attempt(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try drain(new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(b), inf), b.length * 4, maxBytes)
      finally inf.end()
    }
    val looksZlib = b.length >= 2 && (b(0) & 0x0f) == 8 &&
      (((b(0) & 0xff) << 8 | (b(1) & 0xff)) % 31 == 0)
    try {
      val r = attempt(raw = !looksZlib)
      if (r.length > 0 || b.length == 0) r else attempt(raw = looksZlib)
    } catch { case _: java.io.IOException =>
      try attempt(raw = looksZlib) catch { case _: java.io.IOException => b }
    }
  }

  private def drain(in: java.io.InputStream, hint: Int, maxBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        if (out.size > maxBytes)
          throw new IllegalStateException(
            s"decoded entity body exceeds the $maxBytes-byte guard")
        n = in.read(buf)
      }
    } catch {
      // truncated/corrupt tail: keep the sound prefix (CDX convention)
      case _: java.io.EOFException => ()
      case _: java.util.zip.ZipException => ()
    } finally in.close()
    out.toByteArray
  }

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
      // the WHATWG encoding spec folds each CJK family onto its
      // superset encoding — what pages under the narrow label actually
      // contain (same reasoning as latin1 → windows-1252)
      case "gb2312" | "gbk" | "gb_2312" | "gb_2312-80" | "csgb2312" |
          "chinese" | "x-gbk" =>
        Some(Charset.forName("GBK"))
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" =>
        Some(Charset.forName("windows-31j"))
      case "euc-kr" | "ks_c_5601-1987" | "korean" | "ksc5601" =>
        Some(Charset.forName("x-windows-949"))
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

  /** Byte-order mark at the head of the body, if any — per the WHATWG
    * encoding spec's "BOM sniff", which takes precedence over EVERY
    * other signal (a BOM overrides even an explicit Content-Type
    * charset: the byte stream itself says what it is).
    */
  private[io] def charsetFromBom(body: Array[Byte]): Option[Charset] = {
    if (body == null || body.length < 2) None
    else if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
      (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
      Some(StandardCharsets.UTF_8)
    else if ((body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
      Some(StandardCharsets.UTF_16BE)
    else if ((body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
      Some(StandardCharsets.UTF_16LE)
    else None
  }

  /** Decode an entity body per the published WHATWG precedence:
    * BOM sniff (wins over everything, UTF-16 BOMs included) →
    * Content-Type charset → meta sniff → UTF-8 validity →
    * windows-1252. Decoding never throws: unmappable input replaces
    * (CodingErrorAction.REPLACE), matching browser behavior — a crawl
    * pipeline must not die on one mojibake page.
    */
  def decode(body: Array[Byte], contentType: String): String = {
    if (body == null) return null
    val cs = charsetFromBom(body)
      .orElse(charsetFromContentType(contentType))
      .orElse(charsetFromMeta(body))
      .getOrElse {
        if (isValidUtf8(body)) StandardCharsets.UTF_8
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
    // asNondeterministic is a PERFORMANCE pin, not a semantics
    // statement (the parse is pure): it stops Catalyst from collapsing
    // the projection into downstream Filters/Projects and re-running
    // the byte-level parse per reference — the deflateUdf precedent
    // (ops/TextAnalysis.scala)
    val f = udf((p: Array[Byte]) => {
      val r = parse(p)
      (r.status, r.headers, r.body)
    }).asNondeterministic()
    f(payload).cast(
      "struct<status:int,headers:map<string,string>,body:binary>")
  }

  /** `body BINARY`, `contentType STRING` → decoded STRING. */
  def decodeBody(body: Column, contentType: Column): Column = {
    val f = udf((b: Array[Byte], ct: String) => decode(b, ct))
      .asNondeterministic() // performance pin — see split()
    f(body, contentType)
  }

  /** The full wire leg in one hop: Transfer-Encoding de-chunk +
    * Content-Encoding decompress ([[decodeTransfer]]) then charset
    * decode ([[decode]]), driven by the parsed headers MAP from
    * [[split]]. One UDF invocation per row — the three header lookups
    * are map probes, not extra passes.
    */
  def decodeBodyWire(body: Column, headers: Column): Column = {
    val f = udf((b: Array[Byte], te: String, ce: String, ct: String) =>
      decode(decodeTransfer(b, te, ce), ct))
      .asNondeterministic() // performance pin — see split()
    f(body, headers(lit("transfer-encoding")), headers(lit("content-encoding")),
      headers(lit("content-type")))
  }

  /** Build response wire bytes — the writer twin used by round-trip
    * gates and WARC fixture generation: status line, given headers in
    * order, blank line, body encoded with `charset`
    * ([[charsetForLabel]] semantics; unmappable characters replace).
    * `wire` applies the on-the-wire leg: "gzip" gzips the body and
    * adds Content-Encoding, "chunked" splits it into chunked
    * transfer-encoding frames (with a chunk extension and a trailer,
    * so the reader's tolerance is exercised), anything else is plain.
    */
  def encodeResponse(
      status: Int,
      headers: Seq[(String, String)],
      bodyText: String,
      charset: String,
      wire: String = "plain"): Array[Byte] = {
    val cs = charsetForLabel(charset).getOrElse(StandardCharsets.UTF_8)
    val enc = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bodyBuf = enc.encode(java.nio.CharBuffer.wrap(bodyText))
    var body = new Array[Byte](bodyBuf.remaining())
    bodyBuf.get(body)
    val wireHeaders = wire match {
      case "gzip" =>
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(body); g.close()
        body = bos.toByteArray
        Seq("Content-Encoding" -> "gzip")
      case "chunked" =>
        val bos = new java.io.ByteArrayOutputStream(body.length + 64)
        var off = 0
        while (off < body.length) {
          val n = math.min(48, body.length - off)
          val ext = if (off == 0) ";graft=1" else ""
          bos.write(f"$n%x$ext%s\r\n".getBytes(StandardCharsets.ISO_8859_1))
          bos.write(body, off, n)
          bos.write('\r'); bos.write('\n')
          off += n
        }
        bos.write("0\r\nX-Trailer: done\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
        body = bos.toByteArray
        Seq("Transfer-Encoding" -> "chunked")
      case _ => Seq.empty
    }
    val head = new StringBuilder()
      .append("HTTP/1.1 ").append(status).append(' ')
      .append(if (status == 200) "OK" else "Status").append("\r\n")
    (headers ++ wireHeaders).foreach { case (k, v) =>
      head.append(k).append(": ").append(v).append("\r\n")
    }
    head.append("\r\n")
    val hb = head.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }

  /** Column form of [[encodeResponse]] for derivation pipelines:
    * `(status, contentTypeValue, bodyText, charsetLabel, wireMode)` →
    * BINARY. Emits Content-Type plus an `X-Doc` provenance header when
    * `xDoc` is non-null.
    */
  def encodeResponseCol(
      status: Column,
      contentType: Column,
      bodyText: Column,
      charset: Column,
      xDoc: Column,
      wire: Column = lit("plain")): Column = {
    val f = udf((st: Int, ct: String, body: String, cs: String, xd: String, w: String) =>
      encodeResponse(st,
        Seq("Content-Type" -> ct) ++
          (if (xd == null) Seq.empty else Seq("X-Doc" -> xd)) ++
          Seq("Connection" -> "close"),
        body, cs, w)).asNondeterministic() // performance pin — see split()
    f(status, contentType, bodyText, charset, xDoc, wire)
  }
}
