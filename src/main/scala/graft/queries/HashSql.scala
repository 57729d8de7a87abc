package graft.queries

/** DuckDB restatements of the repo's 64-bit hash kernels
  * ([[graft.ops.HashKernels]] fnv1a + the splitmix64 finalizer `mix`) —
  * what promotes the signature-based detectors from GoldenGate pins to
  * full oracle rows (round-14 directive #6): the oracle re-derives every
  * signature from the raw parquet text, so a drifted tokenizer, a wrong
  * constant, or a lost row hash-breaks at the driver.
  *
  * Arithmetic domain: UBIGINT values in [0, 2^64). A 64×64-bit product
  * overflows even HUGEINT (INT128), so multiplication-mod-2^64 splits
  * the left operand: x·c ≡ xl·c + ((xh·(c mod 2^32) mod 2^32) << 32)
  * with xl, xh the 32-bit halves — xl·c < 2^96 fits INT128, the high
  * half only needs its low 32 bits. Shifts are divisions (non-negative
  * domain), xor is native on UBIGINT. Every builder below was validated
  * against the Scala kernels' outputs before shipping (simhash +
  * winnowing pipelines match Spark bit-for-bit at sf0.001/sf0.01).
  */
object HashSql {

  private val P = "18446744073709551616" // 2^64
  private val B = 4294967296L            // 2^32

  /** x·c mod 2^64 without INT128 overflow (c a 64-bit constant). */
  private def mulMod(x: String, c: BigInt): String =
    s"CAST(((CAST($x % $B AS HUGEINT) * $c) + " +
      s"(((CAST($x // $B AS HUGEINT) * ${c % B}) % $B) * $B)) % $P AS UBIGINT)"

  private def addMod(x: String, c: BigInt): String =
    s"CAST((CAST($x AS HUGEINT) + $c) % $P AS UBIGINT)"

  /** FNV-1a over the characters of string expression `t` (ASCII corpus:
    * `unicode` of a 1-char substring IS the UTF-16 unit the Scala
    * kernel folds). The FNV prime is 2^40-ish, so the per-char multiply
    * fits INT128 directly.
    */
  private val fnv1a: String =
    "list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), " +
      "[CAST(unicode(substr(t, CAST(i AS INT), 1)) AS UBIGINT) " +
      "FOR i IN range(1, len(t) + 1)]), " +
      s"(h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % $P AS UBIGINT))"

  /** CTE chain hashing the distinct strings of `dg(t)` to
    * `th(t, h UBIGINT)`: mix(fnv1a(t)) — splitmix64's three
    * xorshift-multiply rounds, stated stage by stage so each 64-bit
    * intermediate stays inspectable.
    */
  private val mixCtes: String = {
    val c1 = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    s"""h1 AS (SELECT t, $fnv1a AS f FROM dg),
       |h2 AS (SELECT t, ${addMod("f", c1)} AS z1 FROM h1),
       |h3 AS (SELECT t, ${mulMod(s"xor(z1, z1 // ${1L << 30})", c2)} AS z2 FROM h2),
       |h4 AS (SELECT t, ${mulMod(s"xor(z2, z2 // ${1L << 27})", c3)} AS z3 FROM h3),
       |th AS (SELECT t, xor(z3, z3 // ${1L << 31}) AS h FROM h4)""".stripMargin
  }

  /** UBIGINT → the BIGINT with the same 64-bit pattern (the Scala
    * kernels compare and sort SIGNED longs — winnowing's window min is
    * a signed min, so the domains must agree before any ordering).
    */
  private def signed(x: String): String =
    s"CAST(CAST($x AS HUGEINT) - CASE WHEN $x >= 9223372036854775808 " +
      s"THEN CAST($P AS HUGEINT) ELSE 0 END AS BIGINT)"

  /** q_dedup_simhash: the full SimHash pipeline from raw text — \S+
    * tokens (per OCCURRENCE), mix(fnv1a(token)) per distinct token, 64
    * per-bit majority votes per document, then ALL PAIRS at Hamming ≤ 3.
    * All-pairs is exactly the banded detector's output: the pigeonhole
    * blocking ([[graft.ops.Dedup.hammingNearDuplicates64]], 4×16-bit
    * chunks) guarantees recall at radius 3 and the detector verifies
    * candidates with the exact bit_count — so the sets are equal by
    * construction, and the oracle certifies the GUARANTEE too.
    */
  def dedupSimhashSql: String = {
    val bitSums = (0 until 64)
      .map(b => s"SUM(CAST((h // ${BigInt(1) << b}) % 2 AS BIGINT)) AS s$b")
      .mkString(",\n    ")
    val sigTerms = (0 until 64)
      .map(b => s"(CASE WHEN 2 * s$b > n THEN CAST(${BigInt(1) << b} AS UBIGINT) " +
        "ELSE CAST(0 AS UBIGINT) END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
       |occ AS (SELECT doc_id, unnest(ws) AS t FROM toks),
       |dg AS (SELECT DISTINCT t FROM occ),
       |$mixCtes,
       |bits AS (
       |  SELECT occ.doc_id, COUNT(*) AS n,
       |    $bitSums
       |  FROM occ JOIN th USING (t) GROUP BY occ.doc_id),
       |sig AS (
       |  SELECT d.doc_id, coalesce($sigTerms, CAST(0 AS UBIGINT)) AS s
       |  FROM (SELECT doc_id FROM toks) d LEFT JOIN bits USING (doc_id))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming_bits
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q_substring_pairs: MOSS winnowing (k=8, w=12) restated — every
    * 8-gram hashed via the distinct-gram join, per-document hash lists
    * in position order, each 12-window's min recorded (the recorded
    * VALUE is the window minimum regardless of the kernel's
    * rightmost-tie position bookkeeping, so the distinct fingerprint
    * SET needs only `list_min` per window — over SIGNED longs, the
    * kernel's comparison domain), then the detector's own document-
    * frequency band [2, max(50, n/50)] and the n_shared ≥ 10 floor.
    */
  def substringPairsSql: String =
    s"""WITH grams AS (
       |  SELECT doc_id, i, substr(text, CAST(i AS INT), 8) AS t
       |  FROM documents,
       |    unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS u(i)),
       |dg AS (SELECT DISTINCT t FROM grams),
       |$mixCtes,
       |ts AS (SELECT t, ${signed("h")} AS h FROM th),
       |hl AS (
       |  SELECT g.doc_id, list(ts.h ORDER BY g.i) AS hs
       |  FROM grams g JOIN ts USING (t) GROUP BY g.doc_id),
       |fps AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(hs) <= 12 THEN [list_min(hs)]
       |         ELSE list_distinct(list_transform(range(1, len(hs) - 10),
       |                i -> list_min(hs[i:i+11])))
       |    END) AS fp
       |  FROM hl),
       |rare AS (
       |  SELECT fp FROM fps GROUP BY fp
       |  HAVING COUNT(*) >= 2 AND COUNT(*) <= greatest(50,
       |    CAST((SELECT COUNT(*) FROM documents) // 50 AS BIGINT)))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |FROM (SELECT * FROM fps WHERE fp IN (SELECT fp FROM rare)) a
       |JOIN (SELECT * FROM fps WHERE fp IN (SELECT fp FROM rare)) b
       |  ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(*) >= 10
       |ORDER BY id_a, id_b""".stripMargin

  // ---- MinHash family: signatures + banding in SQL --------------------
  //
  // [[graft.ops.HashKernels.minhashSig]] restated: shingle hashes are
  // fnv1a over the k-char windows (NO mix), per-function values are
  // splitmix64(shingle XOR f·GOLDEN) with the min taken over SIGNED
  // longs; [[graft.ops.HashKernels.minhashBandBuckets]] folds each
  // band's `rows` signature longs BYTE-WISE (LSB first) through fnv1a
  // and avalanches with the same mix. The oracle shingles by STRING
  // (hash-collision freedom is separately gated by q_shingle_stats);
  // the verify jaccard is the string-set ratio, which equals the
  // kernel's hashed-set ratio under the same no-collision contract.

  /** CTE chain: `sh0(doc_id, ss)` distinct shingle strings,
    * `sizes(doc_id, n)`, `banded(doc_id, band, band_hash)`.
    */
  private def sigCtes(k: Int, numHashes: Int, bands: Int,
      source: String = "documents"): String = {
    val rows = numHashes / bands
    val golden = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    s"""sh0 AS (
       |  SELECT doc_id,
       |    list_distinct([substring(text, i, $k) FOR i IN range(1, greatest(length(text) - ${k - 1}, 1) + 1)]) AS ss
       |  FROM $source),
       |dg AS (SELECT DISTINCT unnest(ss) AS t FROM sh0),
       |gh AS (SELECT t, $fnv1a AS h FROM dg),
       |ds AS (
       |  SELECT s.doc_id, gh.h
       |  FROM (SELECT doc_id, unnest(ss) AS t FROM sh0) s JOIN gh USING (t)),
       |sizes AS (SELECT doc_id, COUNT(DISTINCT h) AS n FROM ds GROUP BY doc_id),
       |m0 AS (
       |  SELECT doc_id, h, f, xor(ds.h, CAST(($golden * f) % $P AS UBIGINT)) AS z0
       |  FROM ds, unnest(range(0, $numHashes)) AS u(f)),
       |m1 AS (SELECT doc_id, f, ${addMod("z0", golden)} AS z1 FROM m0),
       |m2 AS (SELECT doc_id, f, ${mulMod(s"xor(z1, z1 // ${1L << 30})", c2)} AS z2 FROM m1),
       |m3 AS (SELECT doc_id, f, ${mulMod(s"xor(z2, z2 // ${1L << 27})", c3)} AS z3 FROM m2),
       |mh AS (SELECT doc_id, f, ${signed(s"xor(z3, z3 // ${1L << 31})")} AS hv FROM m3),
       |sig AS (SELECT doc_id, f, MIN(hv) AS sv FROM mh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(sv ORDER BY f) AS sg FROM sig GROUP BY doc_id),
       |bb0 AS (
       |  SELECT doc_id, b,
       |    list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
       |      flatten([[CAST(((CASE WHEN sg[b*$rows + r + 1] < 0
       |                       THEN CAST(sg[b*$rows + r + 1] AS HUGEINT) + $P
       |                       ELSE CAST(sg[b*$rows + r + 1] AS HUGEINT) END)
       |                      // (CAST(1 AS HUGEINT) << (8*s))) % 256 AS UBIGINT)
       |                 FOR s IN range(0, 8)]
       |                FOR r IN range(0, $rows)])),
       |      (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % $P AS UBIGINT)) AS bh0
       |  FROM sigl, unnest(range(0, $bands)) AS u(b)),
       |b1 AS (SELECT doc_id, b, ${addMod("bh0", golden)} AS z1 FROM bb0),
       |b2 AS (SELECT doc_id, b, ${mulMod(s"xor(z1, z1 // ${1L << 30})", c2)} AS z2 FROM b1),
       |b3 AS (SELECT doc_id, b, ${mulMod(s"xor(z2, z2 // ${1L << 27})", c3)} AS z3 FROM b2),
       |banded AS (SELECT doc_id, b AS band, xor(z3, z3 // ${1L << 31}) AS band_hash FROM b3)""".stripMargin
  }

  private val jacc =
    "len(list_intersect(x.ss, y.ss))::DOUBLE / " +
      "(len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)))"

  /** Self-join candidates (bucket cap, size bound, band-match floor) +
    * exact string-shingle verify → `vpairs(id_a, id_b, jaccard)`.
    */
  private def pairsCte(threshold: Double, maxBucket: Int, minBandMatches: Int): String = {
    val cap =
      if (maxBucket > 0)
        s"""keep AS (
           |  SELECT band, band_hash FROM banded GROUP BY band, band_hash
           |  HAVING COUNT(*) >= 2 AND COUNT(*) <= $maxBucket),
           |bucketed AS (SELECT banded.* FROM banded JOIN keep USING (band, band_hash)),""".stripMargin
      else "bucketed AS (SELECT * FROM banded),"
    s"""$cap
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM (SELECT bu.*, s.n FROM bucketed bu JOIN sizes s USING (doc_id)) a
       |  JOIN (SELECT bu.*, s.n FROM bucketed bu JOIN sizes s USING (doc_id)) b
       |    USING (band, band_hash)
       |  WHERE a.doc_id < b.doc_id
       |    AND least(a.n, b.n) >= $threshold * greatest(a.n, b.n)
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*) >= $minBandMatches),
       |vpairs AS (
       |  SELECT c.id_a, c.id_b, $jacc AS jaccard
       |  FROM cand c JOIN sh0 x ON x.doc_id = c.id_a JOIN sh0 y ON y.doc_id = c.id_b
       |  WHERE $jacc >= $threshold)""".stripMargin
  }

  /** q_dedup_minhash: the full classic-MinHash detector (k=5, 60 hashes,
    * 12 bands, bucket cap 200) — signatures, banding, candidate pruning
    * and the exact verify all re-derived from raw text.
    */
  def dedupMinhashSql: String =
    s"""WITH ${sigCtes(5, 60, 12)},
       |${pairsCte(0.7, 200, 1)}
       |SELECT id_a, id_b, jaccard FROM vpairs ORDER BY id_a, id_b""".stripMargin

  /** q_dedup_corpus: the 40×8 pair detector → transitive-closure
    * components (min-id labels) → survivors = unpaired docs plus each
    * component's min id. `edges` is MATERIALIZED — the recursion
    * re-evaluates its source per iteration otherwise (measured 49 s →
    * 5 s at sf0.01).
    */
  def dedupCorpusSql: String =
    s"""WITH RECURSIVE ${sigCtes(5, 40, 8)},
       |${pairsCte(0.7, 0, 1)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM vpairs
       |  UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |WHERE c.id IS NULL OR c.component = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** The q_incremental_dedup / q_dedup_index_persist probe: the even-id
    * half is the indexed corpus, the odd half the probing increment
    * (k=3, 40 hashes, 8 bands, ≥2 band matches). `extraCols` appends
    * identity-pinned invariant columns (q_dedup_index_persist's
    * paths_equal rides there — the on-disk probe is gated equal to the
    * in-memory one in-query, so one restatement serves both).
    */
  def incrementalDedupSql(extraCols: String): String =
    s"""WITH ${sigCtes(3, 40, 8)},
       |cand AS (
       |  SELECT a.doc_id AS id_new, b.doc_id AS id_old
       |  FROM (SELECT bu.*, s.n FROM banded bu JOIN sizes s USING (doc_id)
       |        WHERE doc_id % 2 = 1) a
       |  JOIN (SELECT bu.*, s.n FROM banded bu JOIN sizes s USING (doc_id)
       |        WHERE doc_id % 2 = 0) b
       |    USING (band, band_hash)
       |  WHERE least(a.n, b.n) >= 0.7 * greatest(a.n, b.n)
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*) >= 2)
       |SELECT c.id_new, c.id_old, round($jacc, 6) AS jaccard$extraCols
       |FROM cand c JOIN sh0 x ON x.doc_id = c.id_new JOIN sh0 y ON y.doc_id = c.id_old
       |WHERE $jacc >= 0.7
       |ORDER BY id_new, id_old""".stripMargin

  /** q_clean_corpus: the full Gopher-order cleaning pipeline —
    * quality filter → Table-A1 repetition filter → MinHash near-dup
    * election among survivors ([[graft.ops.Corpus.clean]] defaults:
    * k=5, 40 hashes, 8 bands, threshold 0.8). The caller passes the
    * repetition CTE bodies (they live beside the q_repetition_filter
    * oracle so the two restatements cannot drift): `repCtes` WITHOUT
    * its leading `WITH `, the counts select, and the drop-reason CASE.
    * Both filters are per-document, so applying them as one conjunctive
    * `kept` CTE equals the staged Scala order; the dedup stage then
    * runs the [[sigCtes]] pipeline over `kept` and elects min-id
    * survivors through the MATERIALIZED closure.
    */
  def cleanCorpusSql(repCtes: String, repSelect: String, repCase: String): String =
    s"""WITH RECURSIVE $repCtes,
       |counts AS (
       |$repSelect),
       |gs AS (
       |  SELECT doc_id,
       |    len(toks) AS n,
       |    COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_len,
       |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha,
       |    len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','it','for','was','der','die','und','das','ist','nicht','ein','mit','auf','sich','el','la','de','los','es','que','un','una','por','con','le','les','et','est','une','dans','pour','qui'))) AS stops,
       |    (length(text) - length(replace(text, '#', ''))) +
       |    (length(text) - length(replace(text, '...', ''))) // 3 AS symbols
       |  FROM (SELECT doc_id, text,
       |          regexp_extract_all(lower(trim(text)), '\\S+') AS toks
       |        FROM documents)),
       |gkeep AS (
       |  SELECT doc_id FROM gs
       |  WHERE NOT (n < 10 OR n > 100000 OR sum_len < n * 2 OR sum_len > n * 12
       |    OR symbols * 10 > n OR alpha * 10 < n * 7 OR stops < 2)),
       |kept AS (
       |  SELECT d.doc_id, d.text
       |  FROM documents d
       |  JOIN gkeep USING (doc_id)
       |  JOIN counts USING (doc_id)
       |  WHERE ($repCase) IS NULL),
       |${sigCtes(5, 40, 8, "kept")},
       |${pairsCte(0.8, 0, 1)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM vpairs
       |  UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT k.doc_id FROM kept k LEFT JOIN comp c ON k.doc_id = c.id
       |WHERE c.id IS NULL OR c.component = k.doc_id
       |ORDER BY k.doc_id""".stripMargin

  /** q_cdc_gear: the FastCDC gear-chunking state machine
    * ([[graft.plans.GearChunksExpr]]) restated WITHOUT a sequential
    * fold — DuckDB v1.0.0's `list_reduce` silently corrupts struct
    * accumulators when a batch of rows spans vector chunks (verified:
    * the same doc folds to different cut counts depending on its
    * neighbors), so the oracle leans on the gear hash's own windowed
    * algebra instead:
    *
    *   G(p) = Σ_{{j<p}} gear[b_j]·2^(p-1-j) mod 2^64 — the NO-RESET
    *   rolling hash — depends on only the last 64 bytes (higher terms
    *   vanish mod 2^64), so every position is independently
    *   computable; and the reset-at-s hash the kernel actually tests
    *   is H(s,p) = G(p) − G(s)·2^(p−s) mod 2^64 (the G(s) term also
    *   vanishing once p−s ≥ 64).
    *
    * Cuts then follow by a pure-join recursion: from chunk start s the
    * next cut is the smallest p ∈ [s+16, min(s+128, n−1)] whose H has
    * the top `maskBits` bits clear (h < 2^59), else the forced cut at
    * s+128 while interior. The emitted stats match the Spark gate's
    * column set; the gear table itself is [[graft.plans.GearChunksExpr.Gear]]
    * verbatim, embedded as literals.
    */
  def cdcGearSql: String = {
    val gl = graft.plans.GearChunksExpr.Gear
      .map(g => s"CAST(${java.lang.Long.toUnsignedString(g)} AS HUGEINT)")
      .mkString("[", ", ", "]")
    val hExpr =
      s"""(CASE WHEN k >= 64 THEN g.gl[c.s + k]
         |                ELSE ((g.gl[c.s + k]
         |                       - (CASE WHEN c.s = 0 THEN CAST(0 AS HUGEINT) ELSE g.gl[c.s] END)
         |                         * (CAST(1 AS HUGEINT) << CAST(k AS INT))) % $P + $P) % $P
         |           END)""".stripMargin
    s"""WITH RECURSIVE gt AS (SELECT $gl AS g),
       |d AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
       |gp AS MATERIALIZED (
       |  SELECT d.doc_id, d.n,
       |    list_transform(range(1, d.n + 1), p ->
       |      CAST(list_sum(list_transform(range(0, least(64, p)), k ->
       |        (gt.g[unicode(substr(d.text, CAST(p - k AS INT), 1)) + 1]
       |          * (CAST(1 AS HUGEINT) << CAST(k AS INT))) % $P))
       |        % $P AS HUGEINT)) AS gl
       |  FROM d CROSS JOIN gt),
       |cuts(doc_id, s) AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) FROM gp
       |  UNION ALL
       |  SELECT doc_id, nx FROM (
       |    SELECT c.doc_id,
       |      coalesce(
       |        list_min(list_filter(range(16, least(128, g.n - 1 - c.s) + 1), k ->
       |          $hExpr < ${1L << 59})) + c.s,
       |        CASE WHEN c.s + 128 <= g.n - 1 THEN c.s + 128 END) AS nx
       |    FROM cuts c JOIN gp g USING (doc_id)) t
       |  WHERE nx IS NOT NULL),
       |lens AS (
       |  SELECT c.doc_id, nx.n,
       |    coalesce(LEAD(c.s) OVER (PARTITION BY c.doc_id ORDER BY c.s), nx.n) - c.s AS ln,
       |    LEAD(c.s) OVER (PARTITION BY c.doc_id ORDER BY c.s) IS NOT NULL AS non_final
       |  FROM cuts c JOIN (SELECT doc_id, n FROM gp) nx USING (doc_id))
       |SELECT doc_id,
       |  CAST(COUNT(*) AS INT) AS n_chunks,
       |  CAST(SUM(ln) AS INT) AS total_chunk_bytes,
       |  CAST(MAX(ln) AS INT) AS max_chunk_bytes,
       |  SUM(ln) = MIN(n) AS covered_ok,
       |  (MAX(ln) <= 131 AND
       |   coalesce(MIN(CASE WHEN non_final THEN ln END), 16) >= 16) AS bounds_ok
       |FROM lens GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q_split_leakage_safe: the q_neardup_jaccard pair CTE (long
    * oracle-green — string shingles certify the hashed-shingle kernel),
    * connected components as a recursive-CTE transitive closure with
    * min-reachable-id labels (exactly
    * [[graft.ops.Dedup.connectedComponents]]' union-find labels), then
    * the [[graft.ops.Sampling.hashSplit]] CASE over each document's
    * component representative. `splitCase` is the verbatim
    * [[graft.ops.Sampling.hashSplitOracleCase]] output for the rep
    * expression.
    */
  def splitLeakageSafeSql(splitCase: String): String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, lang || '|' || source AS blk,
       |    list_distinct([substring(text, i, 3) FOR i IN range(1, greatest(length(text) - 2, 1) + 1)]) AS s
       |  FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, reach.r
       |  FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id, $splitCase AS split
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |ORDER BY d.doc_id""".stripMargin
}
