package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Column

import graft.Tables
import graft.Materialize.MatOps
import graft.ops.{HtmlExtract, UrlOps}

/** URL / domain-provenance queries (§2.12 web layer), all oracle-backed.
  *
  * The documents table carries no URL column, so each query derives one
  * deterministically from (doc_id, source, lang) — uppercase schemes,
  * www/cdn subdomains, default and explicit ports, tracking params,
  * fragments, multi-part TLDs — with the IDENTICAL derivation written in
  * the oracle SQL, the same cross-engine-injection pattern as
  * q_unicode_nfc. The path slot is `doc_id % 50`, so distinct docs
  * genuinely collide on the normalized URL and the dedup/stat queries
  * exercise real group structure rather than all-singleton groups.
  *
  * Scale shape: the normalization itself is map-only (pure built-in
  * column expressions inside the scan's codegen span); q_url_dedup and
  * q_domain_stats add exactly the ONE hash-aggregate exchange their
  * semantics require, keyed on url_norm / domain — both fine keys at
  * 100 TB (cardinality ~ corpus size / dup factor, no skew beyond what
  * AQE handles).
  */
object Web {

  /** The synthetic URL column — Spark side of the shared derivation. */
  private[queries] def withUrl(df: DataFrame): DataFrame = {
    val sch = when(col("doc_id") % 3 === 0, "HTTP")
      .when(col("doc_id") % 3 === 1, "https").otherwise("HTTPS")
    val sub = when(col("doc_id") % 4 === 0, "WWW.")
      .when(col("doc_id") % 4 === 1, "")
      .when(col("doc_id") % 4 === 2, "cdn.").otherwise("News.")
    val tld = when(col("lang") === "en", "co.uk")
      .when(col("lang") === "de", "de")
      .when(col("lang") === "fr", "fr")
      .when(col("lang") === "es", "com.br").otherwise("com.cn")
    val prt = when(col("doc_id") % 5 === 0, ":80")
      .when(col("doc_id") % 5 === 1, ":443")
      .when(col("doc_id") % 5 === 2, ":8080").otherwise("")
    val ui = when(col("doc_id") % 6 === 0, "user:pw@").otherwise("")
    val esc = when(col("doc_id") % 7 === 0, "/%7e%41%2fx").otherwise("")
    val qry = when(col("doc_id") % 4 === 0, "?utm_source=feed&b=2&a=1")
      .when(col("doc_id") % 4 === 1,
        concat(lit("?id="), col("doc_id") % 50, lit("&utm_campaign=x")))
      .when(col("doc_id") % 4 === 2, "?fbclid=abc").otherwise("")
    val frag = when(col("doc_id") % 2 === 0, "#Section-2").otherwise("")
    df.withColumn("url",
      concat(sch, lit("://"), ui, sub, col("source"), lit("."), tld, prt,
        lit("/"), col("lang"), lit("/Doc-"), col("doc_id") % 50, esc, qry,
        frag))
  }

  /** The same derivation as DuckDB SQL (a CTE every oracle shares). */
  private[queries] val urlCte: String =
    """u AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'HTTPS' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 6 = 0 THEN 'user:pw@' ELSE '' END)
      |    || (CASE doc_id % 4 WHEN 0 THEN 'WWW.' WHEN 1 THEN '' WHEN 2 THEN 'cdn.' ELSE 'News.' END)
      |    || source || '.'
      |    || (CASE lang WHEN 'en' THEN 'co.uk' WHEN 'de' THEN 'de'
      |          WHEN 'fr' THEN 'fr' WHEN 'es' THEN 'com.br' ELSE 'com.cn' END)
      |    || (CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END)
      |    || '/' || lang || '/Doc-' || (doc_id % 50)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '/%7e%41%2fx' ELSE '' END)
      |    || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
      |          WHEN 1 THEN '?id=' || (doc_id % 50) || '&utm_campaign=x'
      |          WHEN 2 THEN '?fbclid=abc' ELSE '' END)
      |    || (CASE doc_id % 2 WHEN 0 THEN '#Section-2' ELSE '' END) AS url
      |  FROM documents)""".stripMargin

  /** DuckDB twin of [[UrlOps.normalize]] + host + registrable domain,
    * as a CTE over `u`. Mirrors the Scala kernel rule-for-rule; the
    * tracker regex and multi-part suffix list are inlined from UrlOps
    * so a drift in either engine fails the gate loudly.
    */
  /** DuckDB twin of [[UrlOps.pctNormalize]] as an inline expression over
    * `s` (evaluated twice — pure). The unreserved-hex list is inlined
    * from the Scala constant so drift fails the gate loudly.
    */
  private[queries] def sqlPct(s: String): String = {
    val hexes = UrlOps.UnreservedHex.map(h => s"'$h'").mkString(", ")
    s"(string_split($s, '%')[1] || coalesce(array_to_string(" +
      s"list_transform(string_split($s, '%')[2:], px -> " +
      "CASE WHEN regexp_matches(substring(px, 1, 2), '^[0-9A-Fa-f]{2}" + "$') THEN " +
      s"(CASE WHEN upper(substring(px, 1, 2)) IN ($hexes) " +
      "THEN decode(unhex(substring(px, 1, 2))) || substring(px, 3, 100000000) " +
      "ELSE '%' || upper(substring(px, 1, 2)) || substring(px, 3, 100000000) END) " +
      "ELSE '%' || px END), ''), ''))"
  }

  private[queries] val normCte: String =
    s"""n AS (
      |  SELECT doc_id, lang, source, n_chars, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |    lower(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      |      '^.*@', ''), ':[0-9]+$$', ''), '\\.$$', '')) AS host,
      |    regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      |      ':([0-9]+)$$', 1) AS prt,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
      |    -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's is ''
      |    coalesce(array_to_string(list_sort(list_filter(
      |      string_split(${sqlPct("regexp_extract(url, '^[^#]*?\\?([^#]*)', 1)")}, '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|fbclid|gclid|ref|mc_eid)='))), '&'), '') AS kept
      |  FROM u),
      |c AS (
      |  SELECT doc_id, lang, source, n_chars, url, host,
      |    sch || '://' || host
      |    || (CASE WHEN prt = '' THEN ''
      |          WHEN sch = 'http'  AND prt = '80'  THEN ''
      |          WHEN sch = 'https' AND prt = '443' THEN ''
      |          ELSE ':' || prt END)
      |    || (CASE WHEN pth = '' THEN '/' ELSE ${sqlPct("pth")} END)
      |    || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS url_norm,
      |    (CASE WHEN len(string_split(host, '.')) <= 2 THEN host
      |       WHEN array_to_string(array_slice(string_split(host, '.'), -2, -1), '.')
      |         IN ('co.uk','ac.uk','gov.uk','com.au','com.cn','com.br','co.jp')
      |       THEN array_to_string(array_slice(string_split(host, '.'), -3, -1), '.')
      |       ELSE array_to_string(array_slice(string_split(host, '.'), -2, -1), '.')
      |     END) AS domain
      |  FROM n)""".stripMargin

  /** Spark side: url → url_norm, host, domain columns appended. `text`
    * rides along for the quality composition; Catalyst's column pruning
    * drops it from the scan for the queries that never touch it.
    */
  private[queries] def normalized(s: SparkSession, dir: String): DataFrame = {
    val withU = withUrl(Tables(s, dir, "documents"))
    val h = UrlOps.host(col("url"))
    withU.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
      col("text"), col("url"), h.as("host"),
      UrlOps.normalize(col("url")).as("url_norm"),
      UrlOps.registrableDomain(h).as("domain"))
  }

  // ---------------------------------------------------------------------
  // Synthetic crawl-page derivation for the HTML-extraction gate. The
  // template wraps each document's text in realistic page chrome — nav
  // bar, script with tag-shaped string traps, style, comment, share row,
  // link-heavy footer — with the text entity-escaped into three <p>
  // paragraphs. The SAME Scala constants build both the Spark column and
  // the DuckDB CTE, so the derivation cannot drift between engines.
  // ---------------------------------------------------------------------
  private val H0 = "<html><!-- chrome: not content --><head><title>Doc "
  private val H1 =
    "</title><style>body { font-size: 12px } nav a { color: blue }</style>" +
      "<script type=text/javascript>var tricky = \"</div><p>not content</p>\"; if (x<3) { y(); }</script>" +
      "</head><body><nav><a href=/>Home</a> <a href=/about>About</a> <a href=/contact>Contact</a></nav>" +
      "<div class=main><p>"
  private val H2 = "</p><p>"
  private val H3 =
    "</p></div><div class=share><a href=/s>Share this with all of your friends and followers right now</a></div>" +
      "<footer>Copyright &amp; legal notices - <a href=/a>terms</a> <a href=/b>privacy</a> " +
      "<a href=/c>imprint</a> <a href=/d>cookies</a> and nothing else of value</footer></body></html>"

  /** Minimal HTML escape of text content (must run BEFORE templating;
    * '&' first so entities are not double-escaped).
    */
  private def escCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** documents + a derived `html` page column (Spark side). */
  private[queries] def withHtml(df: DataFrame): DataFrame = {
    val t = col("text")
    df.withColumn("html", concat(
      lit(H0), col("doc_id"), lit(H1),
      escCol(substring(t, 1, 120)), lit(H2),
      escCol(substring(t, 121, 120)), lit(H2),
      escCol(substring(t, 241, 1000000)), lit(H3)))
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlEsc(s: String): String =
    s"replace(replace(replace($s, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  /** DuckDB twin of [[HtmlExtract.visibleText]]. */
  private def sqlVisible(x: String): String =
    "trim(regexp_replace(" +
      s"replace(replace(replace(replace(replace(replace(" +
      s"regexp_replace($x, '<[^>]*>', ' ', 'g'), " +
      "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', ''''), '&amp;', '&'), " +
      "'\\s+', ' ', 'g'))"

  /** DuckDB twin of [[HtmlExtract.linkChars]]. The coalesce matters:
    * DuckDB's array_to_string([]) is NULL (Spark's is ''), so an
    * anchor-free line would otherwise go NULL through the whole rule.
    */
  private def sqlLinkChars(x: String): String =
    s"length(${sqlVisible(
      s"coalesce(array_to_string(regexp_extract_all($x, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '')")})"

  /** DuckDB twin of the stopword-hit count over a collapsed visible. */
  private def sqlStops(v: String): String = {
    val words = HtmlExtract.DefaultStopwords.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(lower($v), ' '), w -> w IN ($words)))"
  }

  /** CTE `x(doc_id, extracted)`: the full derivation + extraction twin.
    * Mirrors [[withHtml]] + [[HtmlExtract.extract]] rule-for-rule; the
    * block-tag alternation and stopword list are inlined from the Scala
    * constants so a drift in either fails the gate loudly.
    */
  private[queries] val htmlCte: String = {
    val html = s"${sqlLit(H0)} || doc_id || ${sqlLit(H1)} || " +
      s"${sqlEsc("substring(text, 1, 120)")} || ${sqlLit(H2)} || " +
      s"${sqlEsc("substring(text, 121, 120)")} || ${sqlLit(H2)} || " +
      s"${sqlEsc("substring(text, 241, 1000000)")} || ${sqlLit(H3)}"
    val lined =
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        s"'(?i)<br[^>]*>|</?(${HtmlExtract.BlockTags})[^>]*>', chr(10), 'g')"
    val v = sqlVisible("y")
    val keep = s"(length($v) >= 25) AND " +
      s"(${sqlLinkChars("y")} * 100 <= length($v) * 30) AND " +
      s"(${sqlStops(v)} >= 1)"
    s"""hx AS (
       |  SELECT doc_id, $html AS html FROM documents),
       |lx AS (
       |  SELECT doc_id, $lined AS lined FROM hx),
       |x AS (
       |  SELECT doc_id,
       |    -- coalesce: array_to_string([]) is NULL in DuckDB, '' in Spark
       |    coalesce(array_to_string(list_transform(
       |      list_filter(string_split(lined, chr(10)), y -> $keep),
       |      y -> $v), chr(10)), '') AS extracted
       |  FROM lx)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Synthetic HTTP-response derivation for the charset-decoding gate.
  // Each document becomes a wire-format HTTP response whose body is a
  // small HTML page; the ENCODING leg varies by doc_id % 4 so every
  // branch of the published decode precedence is load-bearing:
  //   0: utf-8, declared in the Content-Type header (header wins);
  //   1: windows-1252 bytes declared ONLY by an iso-8859-1 <meta> tag —
  //      the marker is chosen so its cp1252 bytes are ALSO valid UTF-8
  //      (the classic mojibake probe): if the meta sniff or the
  //      latin1→cp1252 WHATWG aliasing broke, the UTF-8 fallback would
  //      decode different characters and the hash gate fails;
  //   2: windows-1252 bytes with NO declaration anywhere — invalid as
  //      UTF-8, so only the validity-check → cp1252 fallback decodes it;
  //   3: utf-8 bytes with no declaration — the validity check must PASS.
  // The page also carries a numeric character reference (&#8217;) so the
  // full entity decode is hash-gated cross-engine (DuckDB: chr(8217)).
  // The oracle computes the expected text directly from the pristine
  // `text` column — it never touches bytes — so any corruption in
  // encode → HTTP split → charset detect → decode → extract mismatches.
  // ---------------------------------------------------------------------
  private val MetaTag =
    "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">"
  private val P0 = "<html><head><title>Doc "
  private val P1 = "</title>"
  private val P2 = "</head><body><nav><a href=/>Home</a> <a href=/a>About</a> " +
    "<a href=/b>Contact</a> <a href=/c>Archive</a></nav>" +
    "<p>the quarterly report&#8217;s marker is "
  private val P3 = " and this line is long enough to keep</p><p>"
  private val P4 = "</p></body></html>"
  private val M0 = "€ draft встреча 道 review"
  private val M1 = "Ã©Ã¼â€“ review"
  private val M2 = "naïve café – déjà vu review"
  private val M3 = "€ über 道 — review"

  /** documents + wire-format HTTP response bytes (Spark side). */
  private def withHttpWire(df: DataFrame): DataFrame = {
    val b = col("doc_id") % 4
    val meta = when(b === 1, lit(MetaTag)).otherwise(lit(""))
    val marker = when(b === 0, lit(M0)).when(b === 1, lit(M1))
      .when(b === 2, lit(M2)).otherwise(lit(M3))
    val html = concat(lit(P0), col("doc_id"), lit(P1), meta, lit(P2),
      marker, lit(P3), escCol(substring(col("text"), 1, 200)), lit(P4))
    // sub-split of the header-declared branch: doc_id % 8 == 4 pages
    // declare charset=gb2312 and carry GBK bytes (the WHATWG fold —
    // marker M0's €/Cyrillic/CJK chars all live in GBK), so the CJK
    // label aliasing is corpus-gated, not just spec-pinned
    val b8 = col("doc_id") % 8
    val csLabel = when(b8 === 4, "gb2312")
      .when(b === 0 || b === 3, "utf-8").otherwise("windows-1252")
    val ctype = when(b8 === 4, "text/html; charset=gb2312")
      .when(b === 0, "text/html; charset=utf-8").otherwise("text/html")
    val status = when(col("doc_id") % 10 === 7, 404).otherwise(200)
    // independent wire leg (doc_id % 5): gzip Content-Encoding, chunked
    // Transfer-Encoding, plain — crossed with the charset branches so
    // e.g. chunked+cp1252 pages exist and the decode ORDER is gated
    val wireMode = when(col("doc_id") % 5 === 0, "gzip")
      .when(col("doc_id") % 5 === 1, "chunked").otherwise("plain")
    df.withColumn("wire",
      graft.io.Http.encodeResponseCol(status, ctype, html, csLabel,
        col("doc_id").cast("string"), wireMode))
  }

  /** DuckDB twin of [[HtmlExtract.visibleTextFull]] for THIS corpus:
    * the generic numeric-reference decode specializes to the one ref
    * the derivation emits (`&#8217;`), placed exactly where
    * decodeEntitiesFull places the numeric step — after the five named
    * entities, before `&amp;`.
    */
  private def sqlVisibleFull(x: String): String =
    "trim(regexp_replace(" +
      "replace(replace(replace(replace(replace(replace(replace(" +
      s"regexp_replace($x, '<[^>]*>', ' ', 'g'), " +
      "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', ''''), '&#8217;', chr(8217)), '&amp;', '&'), " +
      "'\\s+', ' ', 'g'))"

  private def sqlLinkCharsFull(x: String): String =
    s"length(${sqlVisibleFull(
      s"coalesce(array_to_string(regexp_extract_all($x, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '')")})"

  /** CTE `px(doc_id, status, ctype, x_doc, extracted)`: the HTTP-gate
    * derivation + full-decode extraction twin, computed from pristine
    * text (no byte round-trip — that is the point of the gate).
    */
  private val httpCte: String = {
    val html = s"${sqlLit(P0)} || doc_id || ${sqlLit(P1)} || " +
      s"(CASE WHEN doc_id % 4 = 1 THEN ${sqlLit(MetaTag)} ELSE '' END) || " +
      s"${sqlLit(P2)} || " +
      s"(CASE doc_id % 4 WHEN 0 THEN ${sqlLit(M0)} WHEN 1 THEN ${sqlLit(M1)} " +
      s"WHEN 2 THEN ${sqlLit(M2)} ELSE ${sqlLit(M3)} END) || " +
      s"${sqlLit(P3)} || ${sqlEsc("substring(text, 1, 200)")} || ${sqlLit(P4)}"
    val lined =
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        s"'(?i)<br[^>]*>|</?(${HtmlExtract.BlockTags})[^>]*>', chr(10), 'g')"
    val v = sqlVisibleFull("y")
    val keep = s"(length($v) >= 25) AND " +
      s"(${sqlLinkCharsFull("y")} * 100 <= length($v) * 30) AND " +
      s"(${sqlStops(v)} >= 1)"
    s"""ph AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 10 = 7 THEN 404 ELSE 200 END AS status,
       |    CASE WHEN doc_id % 8 = 4 THEN 'text/html; charset=gb2312'
       |         WHEN doc_id % 4 = 0 THEN 'text/html; charset=utf-8'
       |         ELSE 'text/html' END AS ctype,
       |    CAST(doc_id AS VARCHAR) AS x_doc,
       |    $html AS html
       |  FROM documents),
       |pl AS (
       |  SELECT doc_id, status, ctype, x_doc, $lined AS lined FROM ph),
       |px AS (
       |  SELECT doc_id, status, ctype, x_doc,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(string_split(lined, chr(10)), y -> $keep),
       |      y -> $v), chr(10)), '') AS extracted
       |  FROM pl)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HTTP response parsing + wire decoding: wire bytes → (status,
    // headers, body) → chunked de-framing + gzip decompression +
    // charset-detected decode → full-entity HTML extraction. Every
    // decode-precedence branch, both wire encodings, and the header
    // parse are hash-gated against an oracle computed from pristine
    // text. Map-only: encode, split, and decode are one-pass typed
    // UDFs riding in the scan's task; extraction is built-ins.
    "q_http_extract" -> ((s, dir) => {
      val wired = withHttpWire(Tables(s, dir, "documents"))
        .select(col("doc_id"), graft.io.Http.split(col("wire")).as("r"))
      wired.select(col("doc_id"),
          col("r.status").as("status"),
          col("r.headers")("content-type").as("ctype"),
          col("r.headers")("x-doc").as("x_doc"),
          graft.io.Http.decodeBodyWire(col("r.body"),
            col("r.headers")).as("decoded"))
        .select(col("doc_id"), col("status"), col("ctype"), col("x_doc"),
          graft.ops.HtmlExtract.extractFull(col("decoded")).as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // HTML main-content extraction (jusText-style line rules): the
    // synthetic crawl page wraps each doc's text in chrome; the
    // extractor must strip script/style/comments, drop the nav, share
    // row, title and footer (length / link-density / stopword rules)
    // and return the content paragraphs. Map-only — pure built-in
    // column expressions inside the scan's codegen span.
    "q_html_extract" -> ((s, dir) =>
      withHtml(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          HtmlExtract.extract(col("html")).as("extracted"))
        .select(col("doc_id"),
          when(col("extracted") === "", 0)
            .otherwise(size(split(col("extracted"), "\n"))).as("n_lines_kept"),
          length(col("extracted")).as("n_extract_chars"),
          col("extracted"))
        .orderBy(col("doc_id"))),

    // Per-document canonicalization detail: the raw derived URL next to
    // its normalized form, host, and registrable domain. Map-only.
    "q_url_normalize" -> ((s, dir) =>
      normalized(s, dir)
        .select(col("doc_id"), col("url"), col("url_norm"), col("host"),
          col("domain"))
        .orderBy(col("doc_id"))),

    // URL-level exact dedup (the first filter of C4/RefinedWeb): group
    // on the canonical URL, keep the smallest doc_id as survivor. ONE
    // hash aggregate on url_norm.
    "q_url_dedup" -> ((s, dir) =>
      normalized(s, dir)
        .groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("survivor_doc_id"),
          count(lit(1)).as("n_dupes"))
        .orderBy(col("url_norm"))),

    // Domain-level curation stats: docs, distinct canonical URLs,
    // distinct languages, total chars per registrable domain — the
    // table a domain allowlist/blocklist decision reads. ONE aggregate
    // keyed on domain (count(DISTINCT ...) expands to the standard
    // two-phase partial-distinct plan, still a single logical pass).
    "q_domain_stats" -> ((s, dir) =>
      normalized(s, dir)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url_norm")).as("n_urls"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("domain"))),

    // Domain stats keyed on the FULL-ALGORITHM PSL resolver (broadcast
    // snapshot rules, wildcard/exception semantics) instead of the
    // 7-entry SQL twin. On this corpus every suffix is subset-covered,
    // so the oracle is the subset-keyed stats with subset_agrees
    // pinned TRUE — a cross-engine proof that the two resolvers
    // coincide exactly where they must (PslSpec pins where they must
    // NOT: github.io-class tenants, *.ck wildcards). Same one-aggregate
    // shape as q_domain_stats; the PSL lookup is a map-side broadcast
    // probe, no extra exchange.
    "q_domain_stats_psl" -> ((s, dir) =>
      normalized(s, dir)
        .withColumn("domain_psl",
          graft.ops.Psl.registrableDomainPsl(col("host")))
        .groupBy(col("domain_psl"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url_norm")).as("n_urls"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          (min(when(col("domain_psl") === col("domain"), lit(1))
            .otherwise(lit(0))) === 1).as("subset_agrees"))
        .orderBy(col("domain_psl"))),

    // Domain-level quality filtering (the RefinedWeb/C4 "drop bad
    // domains wholesale" step): per-registrable-domain mean of the
    // TextAnalysis quality score, decided integer-exactly — each doc's
    // 6-rounded score becomes micro-units (×1e6, a Long), sums are
    // exact integer sums (order-invariant, partition-invariant), and
    // the keep verdict compares sum >= cutoff·n without ever averaging
    // doubles. ONE domain-keyed aggregate over a map-only projection.
    "q_domain_filter" -> ((s, dir) => {
      val q = graft.ops.TextAnalysis.qualityFeatures(normalized(s, dir), "text")
      val micro = round(col("quality_score") * 1e6).cast("long")
      q.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(micro).as("sum_q_micro"))
        .select(col("domain"), col("n_docs"), col("sum_q_micro"),
          (col("sum_q_micro") >= lit(550000L) * col("n_docs")).as("keep"))
        .orderBy(col("domain"))
    }),

    // Crawl-compliance filter: each domain publishes a deterministic
    // robots.txt (even-length domains scope-block /fr with a carve-out,
    // odd-length domains lock down everything except /en), the generic
    // RFC 9309 evaluator (parse → longest-prefix match, Allow wins
    // ties) decides every doc path, and the oracle hand-reduces those
    // rule sets to their truth tables — green means the generic engine
    // collapses to the right decisions. Map-only.
    "q_robots_filter" -> ((s, dir) => {
      val robots = when(length(col("domain")) % 2 === 0,
          lit("User-agent: *\nDisallow: /fr\nAllow: /fr/Doc-1\n"))
        .otherwise(
          lit("# lockdown\nUser-agent: *\nDisallow: /\nAllow: /en\n"))
      normalized(s, dir).select(col("doc_id"), col("domain"),
          UrlOps.path(col("url")).as("pth"),
          graft.ops.Robots.isAllowed(
            graft.ops.Robots.rulesFor(robots), UrlOps.path(col("url")))
            .as("allowed"))
        .orderBy(col("doc_id"))
    }),

    // Politeness + RFC 9309 special characters: each doc's robots.txt
    // (keyed doc_id % 3) exercises `*`-spans, `$`-anchors, specificity
    // ties, Crawl-delay parsing (first valid value in the * group) and
    // file-wide Sitemap collection; the oracle hand-reduces each rule
    // set to its truth table (regex twins of the glob patterns) and
    // restates the politeness fields as literals. Map-only.
    "q_robots_politeness" -> ((s, dir) => {
      val m = col("doc_id") % 3
      val robots = when(m === 0, lit(
          "User-agent: *\nDisallow: /*/Doc-1$\nCrawl-delay: 1.5\n" +
            "Crawl-delay: 9\nSitemap: https://maps.example/a.xml\n" +
            "Sitemap: https://maps.example/b.xml\n"))
        .when(m === 1, lit(
          "User-agent: *\nDisallow: /fr*Doc\nCrawl-delay: 10\n"))
        .otherwise(lit(
          "User-agent: googlebot\nDisallow: /\nUser-agent: *\n" +
            "Allow: /en\nDisallow: /*-3$\nCrawl-delay: 4\n" +
            "Sitemap: https://maps.example/s.xml\n"))
      normalized(s, dir).select(col("doc_id"), col("domain"),
          UrlOps.path(col("url")).as("pth"),
          graft.ops.Robots.isAllowed(
            graft.ops.Robots.rulesFor(robots), UrlOps.path(col("url")))
            .as("allowed"),
          // §2.2.1 group selection, corpus-gated: branch 2 names
          // googlebot (exact group wins: everything disallowed, and
          // its delay is NULL even though the * group exists); the
          // other branches have no googlebot group (fallback to *,
          // identical verdicts + delays). Case folding gated by the
          // mixed-case token.
          graft.ops.Robots.isAllowed(
            graft.ops.Robots.rulesForAgent(robots, lit("GoogleBot")),
            UrlOps.path(col("url"))).as("allowed_googlebot"),
          graft.ops.Robots.crawlDelayFor(robots).as("crawl_delay"),
          graft.ops.Robots.crawlDelayForAgent(robots, lit("GoogleBot"))
            .as("crawl_delay_googlebot"),
          array_join(graft.ops.Robots.sitemapsFor(robots), ",").as("sitemaps"))
        .orderBy(col("doc_id"))
    }),

    // The capstone: the full crawl-ingest pipeline in one plan — URL
    // canonicalization → URL-level dedup (min-doc_id survivor) →
    // robots.txt compliance → HTTP wire round-trip (each page travels
    // as response BYTES through Http.split + charset decode, the real
    // CommonCrawl shape) → HTML main-content extraction (pages whose
    // chrome-stripped content is empty are dropped) → domain-quality
    // gate computed on the EXTRACTED text — emitting the surviving
    // docs. Each stage is individually oracle-green; this row proves
    // the COMPOSITION (keyed joins on already-shuffled keys; the domain
    // gate side is tiny and broadcasts; the HTTP leg is a pair of
    // one-pass map-only UDFs; extraction is map-only chrome inside the
    // scan's codegen span). The oracle is byte-free: utf-8
    // wrap-then-decode is the identity, so any framing/charset defect
    // in the wire leg hash-mismatches.
    "q_web_pipeline" -> ((s, dir) => {
      val n = normalized(s, dir)
      val survivors = n.groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val robots = when(length(col("domain")) % 2 === 0,
          lit("User-agent: *\nDisallow: /fr\nAllow: /fr/Doc-1\n"))
        .otherwise(
          lit("# lockdown\nUser-agent: *\nDisallow: /\nAllow: /en\n"))
      val wired = withHtml(n).withColumn("r",
        graft.io.Http.split(graft.io.Http.encodeResponseCol(
          lit(200), lit("text/html; charset=utf-8"), col("html"),
          lit("utf-8"), lit(null).cast("string"))))
      // materialized ONCE (eager localCheckpoint): the extraction feeds
      // BOTH the domain-quality gate branch and the final output join,
      // and Spark reuses no map-only subtree across DAG branches — the
      // wire+extract chain would otherwise run twice end-to-end (at
      // fleet scale: persist to DISK_ONLY, same shape)
      val ext = wired
        .withColumn("extracted", HtmlExtract.extract(
          graft.io.Http.decodeBody(col("r.body"),
            col("r.headers")("content-type"))))
        .filter(length(col("extracted")) > 0)
        .select(col("doc_id"), col("domain"), col("url_norm"), col("url"),
          col("extracted"))
        .localCheckpoint()
      val q = graft.ops.TextAnalysis.qualityFeatures(ext, "extracted")
      val micro = round(col("quality_score") * 1e6).cast("long")
      val goodDomains = q.groupBy(col("domain"))
        .agg(sum(micro).as("sq"), count(lit(1)).as("nd"))
        .filter(col("sq") >= lit(550000L) * col("nd")).select("domain")
      ext.join(survivors, Seq("doc_id"))
        .filter(graft.ops.Robots.isAllowed(
          graft.ops.Robots.rulesFor(robots), UrlOps.path(col("url"))))
        .join(goodDomains, Seq("domain"))
        .select(col("doc_id"), col("domain"), col("url_norm"),
          length(col("extracted")).as("n_extract_chars"))
        .orderBy(col("doc_id"))
    }),

    // Temperature-tempered (τ=0.5) token-budget mixture across domains:
    // each registrable domain gets a sqrt-weighted share of a 20k-token
    // budget, filled greedily in md5(doc_id) order with an exact
    // integer cumsum. Emitted as the per-domain fill summary (targets,
    // selected docs/tokens, never-over-budget contract column).
    "q_domain_mixture" -> ((s, dir) => {
      // the budget consumes its input twice (group targets + per-group
      // window) — pin ONE narrow (domain, id, tokens) frame instead of
      // running the full normalization map pass per consumer (the
      // pre-checkpoint plan scanned the parquet 6 times)
      val docs = normalized(s, dir)
        .select(col("domain"), col("doc_id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            t => length(t) > lit(0))).as("n_tokens"))
        .materialized
      val sel = graft.ops.Sampling.stratifiedTokenBudget(
        docs, "domain", "doc_id", "n_tokens", budget = 20000L)
      sel.groupBy(col("domain"))
        .agg(max(col("tok_target")).as("tok_target"),
          count(lit(1)).as("n_sel"),
          sum(col("n_tokens")).as("tok_sel"))
        .select(col("domain"), col("tok_target"), col("n_sel"), col("tok_sel"),
          (col("tok_sel") <= col("tok_target")).as("within_budget"))
        .orderBy(col("domain"))
    })
  )

  // NOTE: no outer stripMargin on these — it would re-strip the first
  // '|' of every '||' concatenation line inside the interpolated CTEs
  // (stripMargin treats the second pipe of '||' as a margin marker).
  // The CTEs are stripMargin'd once at definition; tails are plain.
  def oracle: Map[String, String] = Map(
    "q_http_extract" ->
      (s"WITH $httpCte\n" +
        "SELECT doc_id, status, ctype, x_doc, extracted\n" +
        "FROM px ORDER BY doc_id"),
    "q_html_extract" ->
      (s"WITH $htmlCte\n" +
        "SELECT doc_id,\n" +
        "  CASE WHEN extracted = '' THEN 0\n" +
        "       ELSE len(string_split(extracted, chr(10))) END AS n_lines_kept,\n" +
        "  length(extracted) AS n_extract_chars,\n" +
        "  extracted\n" +
        "FROM x ORDER BY doc_id"),
    "q_url_normalize" ->
      (s"WITH $urlCte,\n$normCte\n" +
        "SELECT doc_id, url, url_norm, host, domain\n" +
        "FROM c ORDER BY doc_id"),
    "q_url_dedup" ->
      (s"WITH $urlCte,\n$normCte\n" +
        "SELECT url_norm, min(doc_id) AS survivor_doc_id,\n" +
        "  count(*) AS n_dupes\n" +
        "FROM c GROUP BY url_norm ORDER BY url_norm"),
    "q_domain_stats" ->
      (s"WITH $urlCte,\n$normCte\n" +
        "SELECT domain, count(*) AS n_docs,\n" +
        "  count(DISTINCT url_norm) AS n_urls,\n" +
        "  count(DISTINCT lang) AS n_langs,\n" +
        "  CAST(sum(n_chars) AS BIGINT) AS total_chars\n" + // sum(BIGINT) is HUGEINT in DuckDB → float in pandas

        "FROM c GROUP BY domain ORDER BY domain"),
    // Truth tables hand-reduced from the two derived robots rule sets
    // under longest-prefix/Allow-ties semantics.
    // PSL-keyed stats: every suffix the synthetic derivation produces is
    // subset-covered, so PSL keys == subset keys and agreement is TRUE
    // everywhere — the oracle states exactly that.
    "q_domain_stats_psl" ->
      (s"WITH $urlCte,\n$normCte\n" +
        "SELECT domain AS domain_psl, count(*) AS n_docs,\n" +
        "  count(DISTINCT url_norm) AS n_urls,\n" +
        "  count(DISTINCT lang) AS n_langs,\n" +
        "  CAST(sum(n_chars) AS BIGINT) AS total_chars,\n" +
        "  TRUE AS subset_agrees\n" +
        "FROM c GROUP BY domain ORDER BY domain"),
    "q_robots_filter" ->
      (s"WITH $urlCte,\n$normCte\n" +
        """SELECT doc_id, domain,
          |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
          |  CASE WHEN length(domain) % 2 = 0 THEN
          |    (CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/fr/Doc-1%' THEN TRUE
          |          WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/fr%' THEN FALSE
          |          ELSE TRUE END)
          |  ELSE
          |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/en%'
          |  END AS allowed
          |FROM c ORDER BY doc_id""".stripMargin),
    // Glob patterns hand-reduced to regex twins: '/*/Doc-1$' ≡
    // '^/.*/Doc-1$'; '/fr*Doc' ≡ '^/fr.*Doc'; '/*-3$' ≡ '-3$' (all
    // paths start '/'); branch 2's Allow:/en (len 3) always loses to
    // the len-5 anchored Disallow when both match — the specificity
    // rule the Spark matcher must reproduce.
    "q_robots_politeness" ->
      (s"WITH $urlCte,\n$normCte\n" +
        """SELECT doc_id, domain,
          |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
          |  CASE doc_id % 3
          |    WHEN 0 THEN NOT regexp_matches(
          |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          |      '^/.*/Doc-1$')
          |    WHEN 1 THEN NOT regexp_matches(
          |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          |      '^/fr.*Doc')
          |    ELSE NOT regexp_matches(
          |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          |      '-3$')
          |  END AS allowed,
          |  -- §2.2.1 selection: branch 2 has an exact googlebot group
          |  -- (Disallow: / → always FALSE; its delay is NULL — no
          |  -- fallback to the * group's 4); branches 0/1 fall back to *
          |  CASE doc_id % 3
          |    WHEN 0 THEN NOT regexp_matches(
          |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          |      '^/.*/Doc-1$')
          |    WHEN 1 THEN NOT regexp_matches(
          |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          |      '^/fr.*Doc')
          |    ELSE FALSE
          |  END AS allowed_googlebot,
          |  CASE doc_id % 3 WHEN 0 THEN 1.5 WHEN 1 THEN 10.0 ELSE 4.0 END AS crawl_delay,
          |  CASE doc_id % 3 WHEN 0 THEN 1.5 WHEN 1 THEN 10.0 ELSE NULL END AS crawl_delay_googlebot,
          |  CASE doc_id % 3
          |    WHEN 0 THEN 'https://maps.example/a.xml,https://maps.example/b.xml'
          |    WHEN 1 THEN ''
          |    ELSE 'https://maps.example/s.xml'
          |  END AS sitemaps
          |FROM c ORDER BY doc_id""".stripMargin),
    // The capstone composition, stage by stage: dedup survivors, the
    // robots truth tables, the micro-quality domain gate — then the
    // three-way join.
    "q_web_pipeline" ->
      (s"WITH $urlCte,\n$normCte,\n$htmlCte,\n" +
        """surv AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY url_norm),
          |xe AS (SELECT doc_id, extracted FROM x WHERE length(extracted) > 0),
          |qm AS (
          |  SELECT c.domain,
          |    CAST(round(round(
          |      least(1.0, len(regexp_extract_all(trim(xe.extracted), '\S+')) / 20.0) * 0.4 +
          |      (1.0 - least(1.0,
          |        ((length(xe.extracted) - length(regexp_replace(xe.extracted, '[[:punct:]]', '', 'g')))::DOUBLE
          |          / greatest(length(xe.extracted), 1)) * 4.0)) * 0.3 +
          |      least(1.0,
          |        (length(regexp_replace(xe.extracted, '[^A-Za-z]', '', 'g'))::DOUBLE
          |          / greatest(length(xe.extracted), 1)) * 1.25) * 0.3,
          |      6) * 1e6) AS BIGINT) AS q_micro
          |  FROM c JOIN xe USING (doc_id)),
          |good AS (
          |  SELECT domain FROM qm GROUP BY domain
          |  HAVING CAST(sum(q_micro) AS BIGINT) >= 550000 * count(*)),
          |rob AS (
          |  SELECT doc_id FROM c
          |  WHERE CASE WHEN length(domain) % 2 = 0 THEN
          |      (CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/fr/Doc-1%' THEN TRUE
          |            WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/fr%' THEN FALSE
          |            ELSE TRUE END)
          |    ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) LIKE '/en%'
          |    END)
          |SELECT c.doc_id, c.domain, c.url_norm,
          |  length(xe.extracted) AS n_extract_chars
          |FROM c JOIN xe USING (doc_id) JOIN surv USING (doc_id)
          |JOIN rob USING (doc_id)
          |JOIN good ON c.domain = good.domain
          |ORDER BY c.doc_id""".stripMargin),
    // Quality formula restated from the q_quality_score oracle (same
    // punct/alpha classes, same weights, same round-6), then quantized
    // to integer micro-units so the per-domain sum is exact.
    "q_domain_filter" ->
      (s"WITH $urlCte,\n$normCte,\n" +
        """q AS (
          |  SELECT c.domain,
          |    CAST(round(round(
          |      least(1.0, len(regexp_extract_all(trim(d.text), '\S+')) / 20.0) * 0.4 +
          |      (1.0 - least(1.0,
          |        ((length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE
          |          / greatest(length(d.text), 1)) * 4.0)) * 0.3 +
          |      least(1.0,
          |        (length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::DOUBLE
          |          / greatest(length(d.text), 1)) * 1.25) * 0.3,
          |      6) * 1e6) AS BIGINT) AS q_micro
          |  FROM c JOIN documents d USING (doc_id))
          |SELECT domain, count(*) AS n_docs,
          |  CAST(sum(q_micro) AS BIGINT) AS sum_q_micro,
          |  CAST(sum(q_micro) AS BIGINT) >= 550000 * count(*) AS keep
          |FROM q GROUP BY domain ORDER BY domain""".stripMargin),
    // Mixture: weights/targets in the temperatureAllocation discipline
    // (sqrt + 1e9 quantization + correctly-rounded double ops), cumsum
    // and budgets in exact integers.
    "q_domain_mixture" ->
      (s"WITH $urlCte,\n$normCte,\n" +
        """t AS (
          |  SELECT c.domain, c.doc_id,
          |    len(regexp_extract_all(lower(trim(d.text)), '\S+')) AS n_tokens,
          |    md5(CAST(c.doc_id AS VARCHAR)) || '|' || CAST(c.doc_id AS VARCHAR) AS rk
          |  FROM c JOIN documents d USING (doc_id)),
          |g AS (
          |  SELECT domain,
          |    CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 1e9) AS BIGINT) AS w_quant
          |  FROM t GROUP BY domain),
          |a AS (
          |  SELECT domain,
          |    CAST(floor(20000.0 * w_quant /
          |      (SELECT CAST(sum(w_quant) AS DOUBLE) FROM g)) AS BIGINT) AS tok_target
          |  FROM g),
          |cum AS (
          |  SELECT domain, doc_id, n_tokens,
          |    sum(n_tokens) OVER (PARTITION BY domain ORDER BY rk
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtok
          |  FROM t),
          |sel AS (
          |  SELECT cum.domain, cum.n_tokens
          |  FROM cum JOIN a USING (domain) WHERE cum.cumtok <= a.tok_target)
          |SELECT a.domain, a.tok_target,
          |  count(*) AS n_sel,
          |  CAST(sum(sel.n_tokens) AS BIGINT) AS tok_sel,
          |  CAST(sum(sel.n_tokens) AS BIGINT) <= a.tok_target AS within_budget
          |FROM sel JOIN a ON sel.domain = a.domain
          |GROUP BY a.domain, a.tok_target ORDER BY a.domain""".stripMargin)
  )
}
