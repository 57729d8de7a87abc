package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / web-provenance kernels for corpus curation.
  *
  * Web-scale training corpora (C4, RefinedWeb, Gopher/MassiveWeb) key
  * their earliest, cheapest dedup and filtering decisions on the URL:
  * normalize it, dedup exact URLs, and aggregate quality signals per
  * registrable domain. These kernels provide that layer as pure
  * built-in-function column expressions — map-only, codegen'd, no UDF,
  * no shuffle — so at 100 TB they ride inside the scan's
  * WholeStageCodegen span and the only shuffles are the ones the
  * *aggregations* (per-domain stats, URL dedup groups) genuinely need.
  *
  * Parsing is RFC-3986-shaped but deliberately regex-simple (authority =
  * everything between `://` and the first `/?#`); every rule is chosen to
  * be expressible identically in ANSI-ish SQL so the whole family stays
  * under the cross-engine oracle gate. No reference counterpart — the
  * reference (cchrysostomou/seqtables) has no web layer; this is part of
  * the §2.12 training-data-pipeline mandate.
  */
object UrlOps {

  /** Query-string parameters that carry tracking state, not content
    * identity. Dropped by [[normalize]]: any `utm_*` plus these exact
    * keys (the lists Firefox/uBlock strip; public knowledge).
    */
  val TrackingExactKeys: Seq[String] = Seq("fbclid", "gclid", "ref", "mc_eid")

  private val trackerRe: String =
    "^(utm_[^=]*|" + TrackingExactKeys.mkString("|") + ")="

  /** Multi-part public suffixes recognized by [[registrableDomain]].
    * A deliberately small, documented subset of the public-suffix list:
    * enough to make the "registrable domain is NOT always the last two
    * labels" semantics real and testable without shipping the full PSL.
    */
  val MultiPartSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "com.au", "com.cn", "com.br", "co.jp")

  /** Lower-cased scheme, or '' when the string has no `scheme://`. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Raw authority (host[:port]) between `://` and the first `/?#`. */
  def hostPort(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** Lower-cased host: authority minus any `userinfo@` prefix (RFC 3986
    * §3.2.1 — `https://user:pw@example.com/` must not yield a
    * `user:pw@example.com` "host", which would also poison the
    * registrable domain), minus any `:port`, minus one trailing dot
    * (`example.com.` == `example.com` in DNS). The strip is GREEDY
    * (`^.*@` — everything up to the LAST '@'): WHATWG URL splits
    * userinfo at the last '@', so a malformed-but-crawled
    * `a@b@host` authority yields `host`, not `b@host`.
    */
  def host(url: Column): Column =
    lower(regexp_replace(regexp_replace(regexp_replace(hostPort(url),
      "^.*@", ""), ":[0-9]+$", ""), "\\.$", ""))

  /** Numeric port as a string, '' when absent. */
  def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  /** Path component ('' when absent — [[normalize]] maps that to "/"). */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string without the leading '?', '' when absent. Fragment is
    * never part of it: the match is anchored to the pre-fragment prefix
    * (`^[^#]*?\?`), so a '?' appearing after '#' is fragment content,
    * not a query (`http://a.com/p#x?y=1` has no query).
    */
  def queryString(url: Column): Column =
    regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

  /** Hex codes of RFC 3986 unreserved characters (ALPHA / DIGIT /
    * `-._~`) — the only percent-escapes that are safe to decode
    * anywhere (escaping them never changes meaning, so `%7E` == `~`).
    * Uppercase, two digits; shared with the DuckDB oracle twin.
    */
  val UnreservedHex: Seq[String] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(c => f"${c.toInt}%02X")

  /** Percent-encoding normalization (RFC 3986 §6.2.2.1-2), applied to
    * path and query during [[normalize]]:
    *   - escapes of unreserved characters decode (`%7E` → `~`,
    *     `%41` → `A`) — equivalent URLs must not fail to dedup over a
    *     cosmetic escape;
    *   - every other valid escape gets uppercase hex (`%2f` → `%2F`);
    *   - a '%' not followed by two hex digits stays literal (malformed
    *     input passes through deterministically, never throws).
    * Reserved escapes are NEVER decoded — `%2F` in a path is data, not
    * a separator. Idempotent by construction (decoded output contains
    * no '%'; uppercased escapes are fixed points). Pure split /
    * transform / array_join built-ins — codegen-friendly, with an
    * exact DuckDB twin (string_split + list slice + list_transform).
    */
  def pctNormalize(s: Column): Column = {
    val pieces = split(s, "%")
    val handled = transform(slice(pieces, 2, 100000000), x => {
      val hex2 = substring(x, 1, 2)
      val tail = substring(x, 3, 100000000)
      when(hex2.rlike("^[0-9A-Fa-f]{2}$"),
        when(upper(hex2).isin(UnreservedHex: _*),
          concat(decode(unhex(hex2), "UTF-8"), tail))
          .otherwise(concat(lit("%"), upper(hex2), tail)))
        .otherwise(concat(lit("%"), x))
    })
    concat(element_at(pieces, 1), array_join(handled, ""))
  }

  /** Canonical form of a URL, the key for URL-level exact dedup:
    *
    *   1. scheme and host lower-cased; one trailing host dot stripped;
    *      `userinfo@` dropped (credentials are not content identity);
    *   2. default port dropped (`:80` for http, `:443` for https) —
    *      other ports kept;
    *   3. fragment dropped (client-side only, never reaches the server);
    *   4. tracking query params dropped ([[TrackingExactKeys]] + `utm_*`),
    *      survivors byte-order sorted (param order is not content
    *      identity), '?' dropped when none survive;
    *   5. empty path becomes "/";
    *   6. percent-escapes canonicalized in path and query
    *      ([[pctNormalize]]: unreserved decode, uppercase hex) —
    *      applied BEFORE the tracker filter and byte sort, so both
    *      operate on canonical bytes.
    *
    * Path case is PRESERVED (paths are case-sensitive per RFC 3986).
    * Built from split/filter/array_sort/array_join + regexes only —
    * stays in WholeStageCodegen, and every rule has an exact DuckDB
    * twin (list_filter/list_sort/array_to_string) for the oracle.
    */
  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val keptParams = array_join(
      array_sort(filter(split(pctNormalize(queryString(url)), "&"),
        c => c =!= lit("") && !c.rlike(trackerRe))), "&")
    val normPort = when(p === "", "")
      .when(sch === "http" && p === "80", "")
      .when(sch === "https" && p === "443", "")
      .otherwise(concat(lit(":"), p))
    val normPath = when(path(url) === "", "/")
      .otherwise(pctNormalize(path(url)))
    concat(sch, lit("://"), h, normPort, normPath,
      when(keptParams === "", "").otherwise(concat(lit("?"), keptParams)))
  }

  /** Registrable ("pay-level") domain of a host: the last two labels,
    * or the last three when the last two form a [[MultiPartSuffixes]]
    * entry (`a.b.co.uk` → `b.co.uk`, not `co.uk`). Hosts with fewer
    * labels come back unchanged. This is the key domain-level curation
    * aggregates group on — two docs from `news.example.com` and
    * `blog.example.com` are the same publisher.
    */
  def registrableDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, n - 1, lit(2)), ".")
    val last3 = array_join(slice(labels, n - 2, lit(3)), ".")
    when(n <= 2, hostCol)
      .when(last2.isin(MultiPartSuffixes: _*), last3)
      .otherwise(last2)
  }
}
