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
       |edges AS (
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
