package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-Suffix-List registrable-domain resolution — the full PSL
  * ALGORITHM (publicsuffix.org/list — public spec: exact rules,
  * `*.`-wildcards matching exactly one label, `!`-exceptions that beat
  * everything, implicit default `*` rule; prevailing rule = exception,
  * else most labels; registrable domain = public suffix + one label)
  * over a vendored snapshot of the list.
  *
  * Relationship to [[UrlOps.registrableDomain]]: that one is the
  * 7-entry, SQL-expressible twin the cross-engine oracle can reproduce;
  * this one is the fidelity path — `user.github.io` splits per user,
  * `*.ck`-class wildcards and the `!www.ck` exception behave per spec.
  * On hosts whose suffix the subset covers, the two agree — pinned by
  * q_domain_stats_psl's `subset_agrees` column (oracle-checked TRUE on
  * the synthetic corpus) and PslSpec's explicit-agreement battery.
  *
  * Scale shape: the rule sets parse once on the driver and ship to
  * executors as a Spark broadcast (one copy per executor, not per
  * task); lookup is a per-row loop over the host's own suffixes
  * (≤ label-count set probes — no regex, no allocation beyond the
  * split), a typed UDF in the [[Robots]]/[[HashKernels]] precedent:
  * map-only, no shuffle, no built-in equivalent to displace.
  *
  * Out of scope, stated: IDN/punycode folding (hosts are matched as
  * given — feed A-labels, i.e. what URLs carry) and the PSL's
  * ICANN/private-section distinction (both sections load as rules,
  * which is how browsers use it for cookie scoping too).
  */
object Psl {

  /** Parsed rule sets. `wildcard` stores the part after `*.`;
    * `exception` stores the rule without its `!`.
    */
  final case class Rules(
      exact: Set[String],
      wildcard: Set[String],
      exception: Set[String]) extends Serializable

  /** PSL-format parser: one rule per line, `//` comments, blanks. */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exception = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.takeWhile(!_.isWhitespace).toLowerCase
        if (rule.startsWith("!")) exception += rule.substring(1)
        else if (rule.startsWith("*.")) wildcard += rule.substring(2)
        else exact += rule
      }
    }
    Rules(exact.result(), wildcard.result(), exception.result())
  }

  /** The vendored snapshot (see resources/graft/public_suffix_snapshot
    * .dat for scope and provenance — a documented subset; the matcher
    * is full-spec, so replacing the resource upgrades fidelity with no
    * code change).
    */
  lazy val snapshot: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Label count of the prevailing public suffix of `labels` (the
    * host's dot-split labels). Default rule `*` ⇒ 1; an exception rule
    * prevails immediately with its own length minus one.
    */
  private[ops] def publicSuffixLabels(labels: Array[String], r: Rules): Int = {
    var best = 1 // the implicit default rule '*'
    var k = 1
    val n = labels.length
    while (k <= n) {
      val suffix = labels.slice(n - k, n).mkString(".")
      if (r.exception.contains(suffix)) return k - 1
      if (r.exact.contains(suffix) && k > best) best = k
      // '*.X' has one more label than X and requires a label to exist
      // in the wildcard position
      if (k < n && r.wildcard.contains(suffix) && k + 1 > best) best = k + 1
      k += 1
    }
    best
  }

  /** Registrable ("pay-level") domain of a lower-cased host. Hosts with
    * no label beyond their public suffix come back unchanged (the
    * [[UrlOps.registrableDomain]] convention — a grouping key must be
    * total, so "this host IS a suffix" maps to itself, not null).
    */
  private[ops] def registrableDomain(host: String, r: Rules): String = {
    if (host == null || host.isEmpty) return host
    val labels = host.split('.')
    val ps = publicSuffixLabels(labels, r)
    if (labels.length <= ps) host
    else labels.slice(labels.length - ps - 1, labels.length).mkString(".")
  }

  /** Column form over the snapshot rules, broadcast once per session. */
  def registrableDomainPsl(host: Column): Column = {
    val bc = org.apache.spark.sql.SparkSession.active
      .sparkContext.broadcast(snapshot)
    udf((h: String) => registrableDomain(h, bc.value)).apply(host)
  }
}
