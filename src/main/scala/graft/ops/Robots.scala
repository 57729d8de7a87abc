package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 subset — public spec), the crawl-
  * compliance filter of the web layer: given each domain's robots.txt
  * and a URL path, decide fetchability. A training-data pipeline runs
  * this both at crawl time and retroactively (takedown/compliance
  * re-filters over an existing corpus).
  *
  * Semantics implemented (the REP core): only `User-agent: *` groups
  * are consulted; `Allow`/`Disallow` prefix rules; the LONGEST matching
  * prefix wins; on a tie Allow wins; no matching rule (or an empty
  * Disallow) means allowed. Unsupported niceties (wildcards, $-anchors,
  * Crawl-delay) are out of scope and documented here rather than
  * half-implemented.
  *
  * Both kernels are tiny per-row loops (rule lists are a handful of
  * entries), shipped as typed UDFs over primitive arrays — the
  * [[HashKernels]] precedent; map-only, no shuffle anywhere.
  */
object Robots {

  /** `Allow:`/`Disallow:` prefixes for `User-agent: *` groups, encoded
    * as "A<prefix>" / "D<prefix>" strings (a struct array buys nothing
    * for two fields and keeps the UDF boxing-free).
    */
  private[ops] def parseStar(robotsTxt: String): Array[String] = {
    if (robotsTxt == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStar = false
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
            if (!afterAgentLine) inStar = false
            if (value == "*") inStar = true
            afterAgentLine = true
          case "allow" if inStar =>
            afterAgentLine = false
            if (value.nonEmpty) out += ("A" + value)
          case "disallow" if inStar =>
            afterAgentLine = false
            if (value.nonEmpty) out += ("D" + value) // empty Disallow = allow all
          case _ =>
            afterAgentLine = false
        }
      }
    }
    out.toArray
  }

  /** Longest-prefix-match verdict; Allow wins ties; default allowed. */
  private[ops] def allowed(rules: Array[String], path: String): Boolean = {
    if (rules == null || path == null) return true
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      val prefix = r.substring(1)
      if (path.startsWith(prefix)) {
        val l = prefix.length
        val isAllow = r.charAt(0) == 'A'
        // longer wins; same length: Allow wins
        if (l > bestLen || (l == bestLen && isAllow)) {
          bestLen = l
          bestAllow = isAllow
        }
      }
      i += 1
    }
    bestAllow
  }

  /** Parse a robots.txt column into the rule array for agent `*`. */
  def rulesFor(robotsTxt: Column): Column =
    udf((t: String) => parseStar(t)).apply(robotsTxt)

  /** Verdict column for (rules array, URL path). */
  def isAllowed(rules: Column, path: Column): Column =
    udf((r: Seq[String], p: String) =>
      allowed(if (r == null) null else r.toArray, p)).apply(rules, path)
}
