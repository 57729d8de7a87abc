package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 subset — public spec), the crawl-
  * compliance filter of the web layer: given each domain's robots.txt
  * and a URL path, decide fetchability. A training-data pipeline runs
  * this both at crawl time and retroactively (takedown/compliance
  * re-filters over an existing corpus).
  *
  * Semantics implemented (the REP core, incl. the RFC 9309 §2.2.3
  * special characters): §2.2.1 group selection by crawler product
  * token (case-insensitive exact group match, `*` fallback, an empty
  * exact group meaning allow-all rather than fallback);
  * `Allow`/`Disallow` path patterns with `*` (any octet sequence) and
  * a trailing `$` (end anchor); the MOST SPECIFIC match wins
  * (specificity = pattern octet length, the spec's "longest match");
  * on a tie Allow wins; no matching rule (or an empty Disallow) means
  * allowed. Politeness extensions carried alongside: `Crawl-delay`
  * (the de-facto Bing/Yandex field — first valid value in a `*`
  * group) and `Sitemap` lines (sitemaps.org: location-independent,
  * collected from the whole file).
  *
  * Both kernels are tiny per-row loops (rule lists are a handful of
  * entries), shipped as typed UDFs over primitive arrays — the
  * [[HashKernels]] precedent; map-only, no shuffle anywhere.
  */
object Robots {

  /** `Allow:`/`Disallow:` prefixes for the groups that GOVERN the given
    * product token, per RFC 9309 §2.2.1 group selection: groups whose
    * `User-agent:` line equals the token case-insensitively are the
    * crawler's groups; only when NO group names the token do the
    * `User-agent: *` groups apply. The existence of a matching group
    * decides, not its rule count — an EMPTY exact group means
    * "everything allowed for you", never a fallback to `*` (the RFC's
    * empty-group semantics). Rules encode as "A<prefix>" / "D<prefix>"
    * strings (a struct array buys nothing for two fields and keeps the
    * UDF boxing-free).
    */
  private[ops] def parseFor(robotsTxt: String, agent: String): Array[String] = {
    if (robotsTxt == null) return Array.empty
    val agentLc = if (agent == null) "*" else agent.trim.toLowerCase
    val exact = scala.collection.mutable.ArrayBuffer.empty[String]
    val star = scala.collection.mutable.ArrayBuffer.empty[String]
    var inExact = false
    var inStar = false
    var existsExact = false
    var afterAgentLine = false
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            // consecutive user-agent lines open ONE group; any rule line
            // closes the agent-line run
            if (!afterAgentLine) { inStar = false; inExact = false }
            if (value == "*") inStar = true
            if (value.toLowerCase == agentLc) { inExact = true; existsExact = true }
            afterAgentLine = true
          case "allow" if inExact || inStar =>
            afterAgentLine = false
            if (value.nonEmpty) {
              if (inExact) exact += ("A" + value)
              if (inStar) star += ("A" + value)
            }
          case "disallow" if inExact || inStar =>
            afterAgentLine = false
            if (value.nonEmpty) { // empty Disallow = allow all
              if (inExact) exact += ("D" + value)
              if (inStar) star += ("D" + value)
            }
          case _ =>
            afterAgentLine = false
        }
      }
    }
    (if (existsExact) exact else star).toArray
  }

  /** [[parseFor]] specialized to the `*` groups. */
  private[ops] def parseStar(robotsTxt: String): Array[String] =
    parseFor(robotsTxt, "*")

  /** Does the RFC 9309 path pattern match the path? Patterns are
    * anchored at the path start; `*` spans any octet sequence; a
    * trailing `$` anchors the match at the path end. Plain prefixes
    * (no specials) degrade to `startsWith` exactly as before.
    */
  private[ops] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = p.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val part = parts(i)
      if (i == parts.length - 1 && anchored) {
        // the final literal must sit at the END of the path, at or
        // after the current scan position
        return path.length - part.length >= pos && path.endsWith(part)
      }
      if (part.nonEmpty) {
        val idx = path.indexOf(part, pos)
        if (idx < 0) return false
        pos = idx + part.length
      }
      i += 1
    }
    if (anchored) path.length == pos // no '*' in pattern: exact match
    else true
  }

  /** Most-specific-match verdict (specificity = pattern length); Allow
    * wins ties; default allowed.
    */
  private[ops] def allowed(rules: Array[String], path: String): Boolean = {
    if (rules == null || path == null) return true
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      val pattern = r.substring(1)
      if (patternMatches(pattern, path)) {
        val l = pattern.length
        val isAllow = r.charAt(0) == 'A'
        if (l > bestLen || (l == bestLen && isAllow)) {
          bestLen = l
          bestAllow = isAllow
        }
      }
      i += 1
    }
    bestAllow
  }

  /** First valid `Crawl-delay` in the groups governing `agent` (same
    * §2.2.1 selection as [[parseFor]]: exact groups if any exist —
    * even delay-less ones — else the `*` groups), seconds; NaN
    * sentinel when absent (a typed UDF cannot return null from a
    * primitive Double — callers translate via [[crawlDelayFor]]).
    */
  private[ops] def crawlDelayOf(robotsTxt: String, agent: String): Double = {
    if (robotsTxt == null) return Double.NaN
    val agentLc = if (agent == null) "*" else agent.trim.toLowerCase
    var inExact = false
    var inStar = false
    var existsExact = false
    var afterAgentLine = false
    var delayExact = Double.NaN
    var delayStar = Double.NaN
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!afterAgentLine) { inStar = false; inExact = false }
            if (value == "*") inStar = true
            if (value.toLowerCase == agentLc) { inExact = true; existsExact = true }
            afterAgentLine = true
          case "crawl-delay" if inExact || inStar =>
            afterAgentLine = false
            value.toDoubleOption.foreach { d =>
              if (d >= 0) {
                if (inExact && delayExact.isNaN) delayExact = d
                if (inStar && delayStar.isNaN) delayStar = d
              }
            }
          case _ =>
            afterAgentLine = false
        }
      }
    }
    if (existsExact) delayExact else delayStar
  }

  private[ops] def crawlDelayStar(robotsTxt: String): Double =
    crawlDelayOf(robotsTxt, "*")

  /** Every `Sitemap:` location in the file, in order (sitemaps.org —
    * the field is independent of user-agent groups).
    */
  private[ops] def sitemapsOf(robotsTxt: String): Array[String] = {
    if (robotsTxt == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toArray
  }

  /** Parse a robots.txt column into the rule array for agent `*`. */
  def rulesFor(robotsTxt: Column): Column =
    udf((t: String) => parseStar(t)).apply(robotsTxt)

  /** Rule array for a SPECIFIC crawler product token (RFC 9309 §2.2.1
    * group selection: case-insensitive exact group, `*` fallback,
    * empty-exact-group means allow-all rather than fallback).
    */
  def rulesForAgent(robotsTxt: Column, agent: Column): Column =
    udf((t: String, a: String) => parseFor(t, a)).apply(robotsTxt, agent)

  /** `Crawl-delay` seconds for a specific crawler product token, null
    * when absent/invalid for the governing group set.
    */
  def crawlDelayForAgent(robotsTxt: Column, agent: Column): Column = {
    val d = udf((t: String, a: String) => crawlDelayOf(t, a))
      .apply(robotsTxt, agent)
    when(isnan(d), lit(null).cast("double")).otherwise(d)
  }

  /** Verdict column for (rules array, URL path). */
  def isAllowed(rules: Column, path: Column): Column =
    udf((r: Seq[String], p: String) =>
      allowed(if (r == null) null else r.toArray, p)).apply(rules, path)

  /** `Crawl-delay` seconds for agent `*`, null when absent/invalid. */
  def crawlDelayFor(robotsTxt: Column): Column = {
    val d = udf((t: String) => crawlDelayStar(t)).apply(robotsTxt)
    when(isnan(d), lit(null).cast("double")).otherwise(d)
  }

  /** `Sitemap:` locations as an ARRAY<STRING> column. */
  def sitemapsFor(robotsTxt: Column): Column =
    udf((t: String) => sitemapsOf(t)).apply(robotsTxt)
}
