package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Hyperlink-graph kernels: outlink/anchor extraction from HTML, RFC
  * 3986 relative-reference resolution, and a deterministic fixed-point
  * PageRank over the domain graph.
  *
  * Links are the web-curation signal the rest of the §2.12 layer does
  * not cover: crawl frontiers are prioritized by in-link authority
  * (OPIC/PageRank), anchor text is a classic relevance/label corpus,
  * and link-spam detection keys on degree shape. The WAT sidecar files
  * CommonCrawl publishes are exactly this extraction. No reference
  * counterpart (cchrysostomou/seqtables has no web layer).
  *
  * Scale shape:
  *   - [[outlinkHrefs]] / [[anchorTexts]] are pure built-in regex
  *     column expressions — map-only, inside the scan's codegen span;
  *   - [[resolveUdf]] is a one-pass compiled string walk per link (the
  *     dot-segment loop has no built-in Column equivalent), map-only;
  *   - [[pageRank]] is `iters` rounds of (edge⋈rank join + dst-keyed
  *     sum), each keyed on the src/dst domain — the natural
  *     partitioning; the per-round dangling mass is a 1-row broadcast,
  *     and each round eagerly truncates lineage so round k+1 never
  *     recomputes round k's three consumers (at fleet scale the same
  *     shape with `persist(DISK_ONLY)`/`checkpoint`).
  */
object LinkGraph {

  // -------------------------------------------------------------------
  // RFC 3986 §5: relative reference resolution
  // -------------------------------------------------------------------

  /** The five URI components (appendix-A split). `authority`, `query`
    * and `fragment` distinguish absent (None) from present-but-empty
    * (Some("")) — RFC resolution treats `?` and no-query differently.
    */
  final case class Uri(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String])

  /** Split per the RFC 3986 appendix-B regex, hand-rolled as one walk
    * (no Regex allocation per row). Total: any string splits.
    */
  def parseUri(s: String): Uri = {
    var rest = if (s == null) "" else s
    // fragment first: everything after the first '#'
    val hash = rest.indexOf('#')
    val fragment = if (hash >= 0) Some(rest.substring(hash + 1)) else None
    if (hash >= 0) rest = rest.substring(0, hash)
    val qm = rest.indexOf('?')
    val query = if (qm >= 0) Some(rest.substring(qm + 1)) else None
    if (qm >= 0) rest = rest.substring(0, qm)
    // scheme: ALPHA *(ALPHA/DIGIT/+/-/.) followed by ':' before any '/'
    // — ASCII only per the RFC's ABNF (Char.isLetter would admit
    // Unicode letters and misclassify crawled refs like "données:x"
    // as absolute URIs)
    var scheme: Option[String] = None
    def asciiAlpha(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val cand = rest.substring(0, colon)
      val ok = asciiAlpha(cand.charAt(0)) && cand.forall(c =>
        asciiAlpha(c) || (c >= '0' && c <= '9') ||
          c == '+' || c == '-' || c == '.')
      if (ok) { scheme = Some(cand); rest = rest.substring(colon + 1) }
    }
    var authority: Option[String] = None
    if (rest.startsWith("//")) {
      val afterSlashes = rest.substring(2)
      val end = afterSlashes.indexWhere(c => c == '/' || c == '?' || c == '#') match {
        case -1 => afterSlashes.length
        case i  => i
      }
      authority = Some(afterSlashes.substring(0, end))
      rest = afterSlashes.substring(end)
    }
    Uri(scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, the standard in/out buffer
    * walk. Climbing past the root clamps (`/a/../../b` → `/b`).
    */
  def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val lastSlash = out.lastIndexOf("/")
        out.setLength(if (lastSlash >= 0) lastSlash else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val seg = if (next >= 0) in.substring(0, next) else in
        out.append(seg)
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.toString
  }

  /** RFC 3986 §5.2.3 merge: reference path joined onto the base. */
  private def merge(base: Uri, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val lastSlash = base.path.lastIndexOf('/')
      if (lastSlash >= 0) base.path.substring(0, lastSlash + 1) + refPath
      else refPath
    }

  private def recompose(u: Uri): String = {
    val sb = new StringBuilder
    u.scheme.foreach(s => { sb.append(s); sb.append(':') })
    u.authority.foreach(a => { sb.append("//"); sb.append(a) })
    sb.append(u.path)
    u.query.foreach(q => { sb.append('?'); sb.append(q) })
    u.fragment.foreach(f => { sb.append('#'); sb.append(f) })
    sb.toString
  }

  /** RFC 3986 §5.2.2 transform-references, strict form: resolve `ref`
    * against `base` and recompose the target URI (fragment included —
    * [[UrlOps.normalize]] drops it downstream). Total: a base with no
    * scheme (not a valid base URI) returns the reference unchanged
    * rather than throwing, so a corpus with garbage URLs never kills a
    * stage.
    */
  def resolve(base: String, ref: String): String = {
    val r = parseUri(ref)
    if (r.scheme.isDefined)
      return recompose(r.copy(path = removeDotSegments(r.path)))
    val b = parseUri(base)
    if (b.scheme.isEmpty) return ref
    val t =
      if (r.authority.isDefined)
        Uri(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Uri(b.scheme, b.authority, b.path,
          if (r.query.isDefined) r.query else b.query, r.fragment)
      else if (r.path.startsWith("/"))
        Uri(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Uri(b.scheme, b.authority, removeDotSegments(merge(b, r.path)),
          r.query, r.fragment)
    recompose(t)
  }

  /** Column form of [[resolve]]. Marked nondeterministic as a PURE
    * PERFORMANCE pin (the function is deterministic): it stops
    * Catalyst's collapsed Filter/Project pairs and unshared DAG
    * branches from re-running the resolution walk per consumer — the
    * same inlining mode the deflate and Http UDF pins address.
    */
  val resolveUdf = udf((base: String, ref: String) =>
    if (ref == null) null else resolve(if (base == null) "" else base, ref))
    .asNondeterministic()

  // -------------------------------------------------------------------
  // Extraction: built-in regex columns, map-only
  // -------------------------------------------------------------------

  /** The anchor-href pattern, boundary-correct on real HTML: the tag
    * must be `<a` followed by whitespace (never `<abbr>`/`<article>`),
    * and the `href` attribute name must sit after whitespace or a
    * quote (never the tail of `data-href`). The value itself must be
    * quote/space/`>`-free — the crawl-grade simplification; quoted
    * values containing spaces are cut at the space. RE2-subset.
    */
  private val HrefPattern: String =
    "(?is)<a\\s(?:[^>]*?[\\s\"'])?href\\s*=\\s*[\"']?([^\"'\\s>]+)"

  /** One pattern matching href AND body together — [[pairHrefs]] /
    * [[pairTexts]] extract different groups of the SAME match set, so
    * the two arrays are positionally aligned by construction (separate
    * href/body scans would mis-pair the moment one regex fires where
    * the other does not: empty hrefs, self-closing anchors).
    */
  private val PairPattern: String = HrefPattern + "[^>]*>(.*?)</a>"

  /** `href` values of anchor tags, document order. */
  def outlinkHrefs(html: Column): Column =
    regexp_extract_all(html, lit(HrefPattern), lit(1))

  /** Anchor (link body) texts, document order, tags stripped. */
  def anchorTexts(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)),
      a => trim(regexp_replace(a, "<[^>]*>", " ")))

  /** hrefs of anchors that have BOTH an href and a `</a>`-closed body —
    * index-aligned with [[pairTexts]] (same match set, group 1).
    */
  def pairHrefs(html: Column): Column =
    regexp_extract_all(html, lit(PairPattern), lit(1))

  /** Bodies of the same anchors (group 2), tags stripped, trimmed. */
  def pairTexts(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(PairPattern), lit(2)),
      a => trim(regexp_replace(a, "<[^>]*>", " ")))

  /** `<loc>` values of a sitemaps.org XML document (urlset entries or
    * sitemapindex children), document order, whitespace-trimmed — the
    * crawl-discovery input robots.txt's `Sitemap:` lines point at.
    * Regex built-ins, map-only; sitemap XML is machine-generated and
    * flat, which is what makes the regex approach sound here (unlike
    * general HTML).
    */
  def sitemapLocs(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<loc>\\s*([^<]+?)\\s*</loc>"), lit(1))

  /** `<lastmod>` values, document order (freshness signals for crawl
    * prioritization; W3C datetime strings, left unparsed — consumers
    * decide the precision they need).
    */
  def sitemapLastmods(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<lastmod>\\s*([^<]+?)\\s*</lastmod>"), lit(1))

  /** True when the document is a sitemap INDEX (children are further
    * sitemaps to fetch, not page URLs).
    */
  def isSitemapIndex(xml: Column): Column =
    xml.rlike("(?is)<\\s*sitemapindex")

  /** `<url>` entries of a urlset as aligned (loc, lastmod) structs —
    * block-scoped extraction, so an entry WITHOUT a lastmod cannot
    * misalign the two arrays the way separate whole-document loc and
    * lastmod scans would. Missing lastmod → null.
    */
  def urlsetEntries(xml: Column): Column =
    transform(regexp_extract_all(xml, lit("(?is)<url>(.*?)</url>"), lit(1)),
      b => struct(
        trim(regexp_extract(b, "(?is)<loc>\\s*([^<]+?)\\s*</loc>", 1)).as("loc"),
        nullif(regexp_extract(b, "(?is)<lastmod>\\s*([^<]+?)\\s*</lastmod>", 1),
          lit("")).as("lastmod")))

  /** `<sitemap>` entries of a sitemapindex, same aligned-struct shape. */
  def sitemapIndexEntries(xml: Column): Column =
    transform(regexp_extract_all(xml, lit("(?is)<sitemap>(.*?)</sitemap>"), lit(1)),
      b => struct(
        trim(regexp_extract(b, "(?is)<loc>\\s*([^<]+?)\\s*</loc>", 1)).as("loc"),
        nullif(regexp_extract(b, "(?is)<lastmod>\\s*([^<]+?)\\s*</lastmod>", 1),
          lit("")).as("lastmod")))

  /** ONE bounded level of sitemapindex → urlset expansion — the hop
    * between `robots.txt: Sitemap:` discovery and the page frontier.
    * Non-index documents emit their urlset entries directly (depth 0);
    * index documents explode their child-sitemap locs and JOIN them
    * against `fetched(url, xml)` — the fetch modeled the only way a
    * distributed crawl can model it, as a url-keyed join against the
    * fetched bodies — then parse each child as a urlset (depth 1).
    *
    * The recursion is DELIBERATELY one level per call (sitemaps.org
    * caps real nesting at 50k children and crawlers cap depth to
    * resist sitemap bombs): a child that is itself an index
    * contributes no rows here — feed it back through another call
    * with the next fetch wave to descend further, each wave one keyed
    * join, never an unbounded driver loop.
    *
    * Output: (id, child_sitemap STRING null at depth 0, loc, lastmod,
    * depth INT). Map-only regex + one keyed join; at 100 TB the join
    * is frontier-sized, not corpus-sized.
    */
  def expandSitemaps(
      sitemaps: DataFrame, idCol: String, xmlCol: String,
      fetched: DataFrame): DataFrame = {
    val base = sitemaps.select(col(idCol).as("id"), col(xmlCol).as("xml"),
      isSitemapIndex(col(xmlCol)).as("is_index"))
    val direct = base.filter(!col("is_index"))
      .select(col("id"), explode(urlsetEntries(col("xml"))).as("e"))
      .select(col("id"), lit(null).cast("string").as("child_sitemap"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        lit(0).as("depth"))
    // one body per URL, enforced deterministically: if the fetch layer
    // hands in duplicate URLs (retries, mirrored shards), min(xml) picks
    // a stable winner instead of multiplying every child's entries by
    // the duplicate count with a shuffle-order-dependent survivor
    val f = fetched.select(col(fetched.columns(0)).as("__curl"),
      col(fetched.columns(1)).as("__cxml"))
      .groupBy(col("__curl")).agg(min(col("__cxml")).as("__cxml"))
    val viaIndex = base.filter(col("is_index"))
      .select(col("id"), explode(sitemapIndexEntries(col("xml"))).as("c"))
      .select(col("id"), col("c.loc").as("child_sitemap"))
      .join(f, col("child_sitemap") === col("__curl"))
      .filter(!isSitemapIndex(col("__cxml"))) // depth cap: index-of-index waits for the next wave
      .select(col("id"), col("child_sitemap"),
        explode(urlsetEntries(col("__cxml"))).as("e"))
      .select(col("id"), col("child_sitemap"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        lit(1).as("depth"))
    direct.unionByName(viaIndex)
  }

  // -------------------------------------------------------------------
  // PageRank: deterministic fixed-point integer iteration
  // -------------------------------------------------------------------

  /** Weighted PageRank with damping 0.85 over `edges(src, dst, w)`,
    * ALL arithmetic in scaled fixed-point Longs so the result is
    * bit-identical across partitionings, engines, and runs:
    *
    *   - ranks are integers in units of `scale⁻¹` (total initial mass
    *     = `scale`), start at `scale div n`;
    *   - a node's contribution along an edge is
    *     `(rank * w) div out_weight` — floor division, never a double;
    *   - dangling mass (nodes with no out-edges) redistributes
    *     uniformly as `dang div n`;
    *   - update: `rank' = (15·scale) div (100·n)
    *       + (85 · (contrib + dang div n)) div 100`.
    *
    * Floor division leaks a few units of mass per round (bounded by
    * n + 1 units per round) — the price of exactness; rankings are
    * unaffected. All operands are non-negative, where Spark's `div`
    * and DuckDB's `//` agree, so the DuckDB oracle unrolls the SAME
    * recurrence and the gate is hash-exact.
    *
    * Scale shape per round: one shuffle join of edges with ranks on
    * src (both sides hash-partitioned on the join key), one dst-keyed
    * partial+final sum, a 1-row broadcast for the dangling mass, and a
    * left join back onto the node set. `localCheckpoint` truncates the
    * plan each round — without it round k's DataFrame is re-derived by
    * each of round k+1's three consumers and the DAG grows 3^k. On a
    * cluster the same truncation is `persist(StorageLevel.DISK_ONLY)`
    * + count, or reliable `checkpoint`.
    *
    * The node count lands on the driver (one count job) — it is a
    * scalar of the formula, bounded by the domain population, not a
    * data collect.
    */
  /** Connected components by `rounds` rounds of undirected min-label
    * propagation: every node starts labeled with itself; each round a
    * node takes the minimum of its own label and its neighbors' —
    * after k rounds labels have traveled k hops, so components of
    * diameter ≤ `rounds` are exact. Returns (node, lbl, lbl_prev);
    * `lbl == lbl_prev` for all nodes ⟺ the propagation converged
    * (callers surface that as a contract column). Deliberately a
    * FIXED-round recurrence, not an until-fixpoint loop: both engines
    * unroll the same k rounds, so the result is hash-gateable even on
    * a graph where k rounds would NOT converge — the oracle checks
    * the recurrence, the converged bit checks the graph. (For
    * unbounded-diameter graphs [[Dedup]]'s component machinery is the
    * production path; web domain graphs have small diameter, so k
    * keyed joins is the right scale shape here.)
    *
    * Per round: one (neighbor⋈label) shuffle join + ONE node-keyed min
    * aggregate over the union of neighbor contributions and the label
    * frame itself — `min(own ∪ neighbor labels)` is exactly
    * `least(own, coalesce(min(neighbors), own))`, so the completion
    * left-join the round-15 shape paid per round rides the aggregate
    * (guide §2.4, the HITS-completion method): isolated nodes survive
    * through their own-label row, and every node appears exactly once
    * in the result. One fewer exchange + one fewer join per round;
    * lineage truncated per round.
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      snapshotAt: Option[Int] = None): DataFrame = {
    require(rounds >= 1, "labelPropagation: rounds must be >= 1")
    require(snapshotAt.forall(k => k >= 1 && k <= rounds),
      "labelPropagation: snapshotAt must be in [1, rounds]")
    val e = edges.select(col("src"), col("dst")).materialized
    val und = e.select(col("src").as("s"), col("dst").as("d"))
      .union(e.select(col("dst").as("s"), col("src").as("d")))
    val nodes = und.select(col("s").as("node")).distinct().materialized
    var labels = nodes.withColumn("lbl", col("node")).materialized
    var prev = labels
    var snap: DataFrame = null
    for (k <- 1 to rounds) {
      prev = labels
      val contrib = und.join(labels, und("s") === labels("node"))
        .select(col("d").as("node"), col("lbl"))
      labels = contrib.union(labels.select(col("node"), col("lbl")))
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .materialized
      if (snapshotAt.contains(k)) snap = labels
    }
    val base = labels.join(prev.withColumnRenamed("lbl", "lbl_prev"), "node")
    // the mid-run snapshot rides along in the ONE propagation run —
    // re-running k rounds just to observe round k would double the
    // shuffle-round count at scale
    if (snap == null) base
    else base.join(snap.withColumnRenamed("lbl", "lbl_snap"), "node")
  }

  /** `init`: warm-start rank frame (node, rank) — yesterday's fixed
    * point, so an incremental re-rank needs fewer rounds to settle.
    * Nodes absent from `init` (today's new domains) start at the cold
    * uniform mass. The recurrence reads nothing but the current rank
    * vector, so warm-starting from round k's output for j rounds is
    * BIT-IDENTICAL to cold-starting k+j rounds (LinkGraphSpec pins it;
    * q_pagerank_warm gates it against the unrolled oracle).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    // materialized once: e is consumed by every round (and nodes/outw
    // derive from it) — without truncation each round would re-derive
    // the caller's whole edge pipeline (extraction, joins, UDFs)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .materialized
    // loop-invariant work hoisted out of the rounds: the per-source
    // out-weight never changes, so it is attached to each edge ONCE
    // here instead of a second shuffle join inside every round; the
    // dangling-node flag likewise rides the node frame so each round's
    // dangling mass is a filter over the already-materialized rank
    // vector, not a fresh anti-join against outw
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val eo = e.join(outw, "src").materialized // (src, dst, w, outw)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(outw.select(col("src").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .materialized
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge set")
    val base = (15L * scale) / (100L * n) // floor, non-negative
    var ranks = init match {
      case None => nodes.withColumn("rank", lit(scale / n))
      case Some(w0) => nodes
        .join(w0.select(col(w0.columns(0)).as("node"),
          col(w0.columns(1)).cast("long").as("rank")), Seq("node"), "left")
        .select(col("node"), col("has_out"),
          coalesce(col("rank"), lit(scale / n)).as("rank"))
        .materialized
    }
    for (_ <- 1 to iters) {
      // floor(rank·w / outw) via the exact identity
      //   (rank div outw)·w + ((rank mod outw)·w) div outw
      // — a naive rank·w product overflows Long once an edge weight
      // exceeds ~9.2e6 against near-scale ranks; here the largest
      // intermediate is (rank mod outw)·w < outw·w, safe for any
      // realistic weighted domain graph. Same identity in the oracle.
      //
      // Node completion rides the aggregate (guide §2.4, the
      // labelPropagation method): the node frame unions into the
      // contribution stream as a zero row per node, so one node-keyed
      // sum yields every node's contribution (0 where nothing arrived)
      // AND carries the has_out flag (max over {flag, nulls} = flag) —
      // the round-15 shape paid a left join back onto the node set per
      // round for exactly this completion.
      val contribs = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(rank div outw) * w + ((rank % outw) * w) div outw").as("c"),
          lit(null).cast("boolean").as("has_out"))
      val dang = ranks.filter(!col("has_out"))
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      ranks = contribs
        .unionByName(nodes.select(col("node"), lit(0L).as("c"), col("has_out")))
        .groupBy("node").agg(sum("c").as("contrib"), max("has_out").as("has_out"))
        .crossJoin(broadcast(dang))
        .select(col("node"), col("has_out"),
          (lit(base) + expr(
            s"(85 * (contrib + (dang div ${n}L))) div 100"))
            .as("rank"))
        .materialized
    }
    ranks.select(col("node"), col("rank"))
  }

  /** TrustRank (Gyöngyi, Garcia-Molina, Pedersen — VLDB '04): PageRank
    * with the teleport restricted to a TRUSTED seed set. Trust flows
    * out of the seeds along links; a domain unreachable from every
    * seed floors to rank 0 — the spam-demotion signal link farms
    * cannot fake by linking to each other. Same fixed-point integer
    * discipline as [[pageRank]] (floor divisions only, overflow-safe
    * contribution identity, dangling mass re-teleports to the seeds),
    * so the recurrence is hash-gateable against an unrolled oracle.
    *
    * `seeds`' first column is the node id; it is intersected with the
    * graph's node set. Per round: the same edge⋈rank join + dst-keyed
    * sum as PageRank, plus a broadcast-size seed-flag join.
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .materialized
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // loop-invariant hoists, same as [[pageRank]]: out-weight attached
    // to each edge once, dangling flag carried on the node/rank frames
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val eo = e.join(outw, "src").materialized // (src, dst, w, outw)
    val sd = nodes.join(
      seeds.select(col(seeds.columns.head).as("node")).distinct(), "node")
    val flagged = nodes
      .join(sd.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .join(outw.select(col("src").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"),
        coalesce(col("has_out"), lit(false)).as("has_out"))
      .materialized
    val nS = flagged.filter(col("is_seed")).count()
    require(nS > 0, "trustRank: no seed intersects the graph")
    val base = (15L * scale) / (100L * nS)
    var ranks = flagged
      .select(col("node"), col("has_out"),
        when(col("is_seed"), lit(scale / nS)).otherwise(lit(0L)).as("rank"))
      .materialized
    for (_ <- 1 to iters) {
      // node completion rides the aggregate (guide §2.4): the flagged
      // node frame unions in as zero rows carrying is_seed/has_out, so
      // the per-round left join back onto the node set is gone
      val contribs = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(rank div outw) * w + ((rank % outw) * w) div outw").as("c"),
          lit(null).cast("boolean").as("is_seed"),
          lit(null).cast("boolean").as("has_out"))
      val dang = ranks.filter(!col("has_out"))
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      ranks = contribs
        .unionByName(flagged.select(col("node"), lit(0L).as("c"),
          col("is_seed"), col("has_out")))
        .groupBy("node").agg(sum("c").as("contrib"),
          max("is_seed").as("is_seed"), max("has_out").as("has_out"))
        .crossJoin(broadcast(dang))
        .select(col("node"), col("has_out"),
          when(col("is_seed"),
            lit(base) + expr(
              s"(85 * (contrib + (dang div ${nS}L))) div 100"))
            .otherwise(expr("(85 * contrib) div 100"))
            .as("rank"))
        .materialized
    }
    flagged.select(col("node"), col("is_seed"))
      .join(ranks.select(col("node"), col("rank")), "node")
  }

  /** Personalized (topic-sensitive) PageRank — Haveliwala, WWW '02:
    * [[trustRank]]'s seeded teleport generalized to an ARBITRARY
    * positive-weight teleport vector. Teleport mass (and the dangling
    * re-teleport) distributes ∝ weight instead of uniformly over a
    * seed set; `teleport(node, w)` with uniform w reproduces trustRank
    * exactly, a full-support vector gives topic-weighted global
    * PageRank. Same fixed-point integer discipline (floor divisions
    * only, the overflow-safe `(a div b)·w + ((a mod b)·w) div b`
    * spelling of floor(a·w/b) everywhere), so the recurrence is
    * hash-gateable against an unrolled DuckDB twin.
    *
    * Overflow domain: requires Σw and max w ≤ 3e9 (their product is
    * the largest intermediate; 3e9·3e9 < 2^63). Weights beyond that
    * should be pre-scaled down — only ratios matter.
    *
    * Per round: the same edge⋈rank shuffle + dst-keyed sum as
    * PageRank, plus the broadcast 1-row dangling total; the teleport
    * weights ride the node frame. Output: (node, tw, rank).
    *
    * `init`: warm-start rank frame (node, rank) — same contract as
    * [[pageRank]]'s: round-k output + j warm rounds == k+j cold rounds
    * bit for bit; nodes missing from `init` start at their cold
    * teleport share.
    */
  def personalizedPageRank(edges: DataFrame, teleport: DataFrame,
      iters: Int = 5, scale: Long = 1000000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "personalizedPageRank: iters must be >= 1")
    require((15L * scale) % 100L == 0,
      "personalizedPageRank: 15*scale must be divisible by 100 for an exact teleport base")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .materialized
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // loop-invariant hoists, same as [[pageRank]]: out-weight attached
    // to each edge once, dangling flag carried on the node/rank frames
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val eo = e.join(outw, "src").materialized // (src, dst, w, outw)
    val tv = teleport.select(col(teleport.columns(0)).as("node"),
      col(teleport.columns(1)).cast("long").as("tw"))
      .filter(col("tw") > 0)
    val flagged = nodes.join(tv, Seq("node"), "left")
      .join(outw.select(col("src").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("tw"), lit(0L)).as("tw"),
        coalesce(col("has_out"), lit(false)).as("has_out"))
      .materialized
    val head = flagged.agg(sum(col("tw")), max(col("tw"))).head()
    val bigW = head.getLong(0)
    require(bigW > 0, "personalizedPageRank: no teleport node intersects the graph")
    require(bigW <= 3000000000L && head.getLong(1) <= 3000000000L,
      s"personalizedPageRank: teleport mass out of the exact-integer domain " +
      s"(sum=$bigW, max=${head.getLong(1)}; both must be <= 3e9 — rescale the weights)")
    val telBase = (15L * scale) / 100L
    // floor(x·tw/W) via the exact identity, constants precomputed
    def share(x: Long): Column =
      lit(x / bigW) * col("tw") + expr(s"((${x % bigW}L) * tw) div ${bigW}L")
    var ranks = (init match {
      case None => flagged.select(col("node"), col("tw"), col("has_out"),
        share(scale).as("rank"))
      case Some(w0) => flagged
        .join(w0.select(col(w0.columns(0)).as("node"),
          col(w0.columns(w0.columns.length - 1)).cast("long").as("r0")),
          Seq("node"), "left")
        .select(col("node"), col("tw"), col("has_out"),
          coalesce(col("r0"), share(scale)).as("rank"))
    }).materialized
    for (_ <- 1 to iters) {
      // node completion rides the aggregate (guide §2.4): the flagged
      // node frame unions in as zero rows carrying tw/has_out, so the
      // per-round left join back onto the node set is gone
      val contribs = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(rank div outw) * w + ((rank % outw) * w) div outw").as("c"),
          lit(null).cast("long").as("tw"),
          lit(null).cast("boolean").as("has_out"))
      val dang = ranks.filter(!col("has_out"))
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      ranks = contribs
        .unionByName(flagged.select(col("node"), lit(0L).as("c"),
          col("tw"), col("has_out")))
        .groupBy("node").agg(sum("c").as("contrib"),
          max("tw").as("tw"), max("has_out").as("has_out"))
        .crossJoin(broadcast(dang))
        .select(col("node"), col("tw"), col("has_out"),
          when(col("tw") > 0,
            share(telBase) + expr(
              s"(85 * (contrib + " +
              s"((dang div ${bigW}L) * tw + ((dang % ${bigW}L) * tw) div ${bigW}L)" +
              s")) div 100"))
            .otherwise(expr("(85 * contrib) div 100"))
            .as("rank"))
        .materialized
    }
    ranks.select(col("node"), col("tw"), col("rank"))
  }

  /** HITS (Kleinberg, JACM '99 — "Authoritative sources in a
    * hyperlinked environment"): the mutually-recursive hub/authority
    * pair — `auth ← Aᵀ·hub`, `hub ← A·auth` — with each vector
    * L1-normalized to `scale` per half-round (Kleinberg normalizes to
    * keep the iteration bounded; the norm choice rescales, it does not
    * reorder). Complements [[pageRank]]/[[trustRank]]: PageRank ranks
    * by random-walk visitation, HITS separates the pages that POINT AT
    * good content (hubs — link directories, aggregators) from the
    * content itself (authorities) — the split a crawl scheduler uses
    * to seed frontier expansion vs corpus inclusion.
    *
    * Integer discipline, hash-gateable like the other fixed points:
    * scores are scaled Longs; the weighted sums and the exact
    * normalization `floor(raw·scale / Σraw)` run in DECIMAL(38,0)
    * (`raw·scale` reaches ~1e28 on a near-scale vector — past Long,
    * comfortably inside decimal-38; DuckDB's twin uses HUGEINT), and
    * `div nullif(Σ, 0)` keeps an all-zero vector a 0-vector on both
    * engines instead of an error. Per round: two edge⋈score shuffle
    * joins + two keyed sums + two 1-row broadcast norm totals — the
    * same co-partitioned round shape as PageRank, so the 100 TB story
    * is iters × (two keyed shuffles), lineage truncated per round.
    *
    * `init`: warm-start HUB frame (node, hub) — the [[pageRank]] init
    * contract applied to HITS' only inter-round state (auth is derived
    * from hub inside each round, so the hub vector alone IS the fixed
    * point's state). Round-k output's hub column + j warm rounds ==
    * k+j cold rounds bit for bit (LinkGraphSpec pins it; q_hits_warm
    * gates it against the same unrolled oracle chain as q_hits) —
    * the daily incremental re-rank, same as PageRank's.
    */
  def hits(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .materialized
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().materialized
    val n = nodes.count()
    require(n > 0, "hits: empty edge set")
    // weighted sum in decimal: w·score stays exact for any Long score
    // and realistic weight (decimal-38 headroom ~1e38 vs the ~1e16
    // worst-case round total)
    def weighted(score: Column): Column =
      (col("w").cast("decimal(20,0)") * score.cast("decimal(20,0)"))
        .cast("decimal(38,0)")
    // exact L1 normalization to `scale`, the 1-row total broadcast.
    // Deliberately NOT completed back onto the full node set here: a
    // node absent from `raw` normalizes to 0, and a 0-score row is
    // inert everywhere the vector is consumed inside the iteration
    // (weighted(0) = 0 in the next half-round's sum; 0 adds nothing to
    // the norm total), so the per-half-round nodes join the round-14
    // shape paid — two full node-set shuffles per round — carried no
    // information. The one place completeness matters is the FINAL
    // output, which re-attaches the node set once (coalesce to 0) —
    // bit-identical values, 2·iters fewer joins.
    def normalized(raw: DataFrame, outName: String) = {
      val s = raw.agg(sum("raw").as("s"))
      raw.crossJoin(broadcast(s))
        .select(col("node"),
          coalesce(
            expr(s"CAST((raw * CAST($scale AS DECIMAL(20,0))) div nullif(s, 0) AS BIGINT)"),
            lit(0L)).as(outName))
    }
    var hub = (init match {
      case None => nodes.withColumn("hub", lit(scale / n))
      case Some(h0) => nodes
        .join(h0.select(col(h0.columns(0)).as("node"),
          col(h0.columns(1)).cast("long").as("hub0")), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hub0"), lit(scale / n)).as("hub"))
    }).materialized
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = e.join(hub, e("src") === hub("node"))
        .select(col("dst").as("node"), weighted(col("hub")).as("x"))
        .groupBy("node").agg(sum("x").cast("decimal(38,0)").as("raw"))
      auth = normalized(authRaw, "auth").materialized
      val hubRaw = e.join(auth, e("dst") === auth("node"))
        .select(col("src").as("node"), weighted(col("auth")).as("x"))
        .groupBy("node").agg(sum("x").cast("decimal(38,0)").as("raw"))
      hub = normalized(hubRaw, "hub").materialized
    }
    // the ONE node-set completion: every node appears in the output,
    // absent-from-raw scores coalesce to the 0 they always were
    nodes.join(auth, Seq("node"), "left").join(hub, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("auth"), lit(0L)).as("auth"),
        coalesce(col("hub"), lit(0L)).as("hub"))
  }
}
