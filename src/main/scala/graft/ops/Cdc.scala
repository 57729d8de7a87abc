package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — sub-document dedup at chunk
  * granularity, the LBFS/Venti/rsync family of techniques (public
  * knowledge; Muthitacharoen et al., SOSP'01).
  *
  * Fixed-offset chunking breaks under insertion (every later chunk
  * shifts); CDC instead cuts wherever the CONTENT hashes below a
  * threshold, so an edit only disturbs the chunks it touches. Boundary
  * rule: a cut lands after codepoint position `i` when the w-gram
  * ending at `i` satisfies `md5(gram) <= t` for a 2-hex-char prefix
  * threshold `t` — P(cut) = (t+1)/256 per position, so expected chunk
  * length ≈ 256/(t+1). md5 is the anchor hash (not a security choice)
  * because BOTH engines ship it with identical semantics, which keeps
  * the whole family under the cross-engine oracle gate.
  *
  * Cost model, stated honestly: hashing every w-codepoint window from
  * scratch is O(w·n) bytes through MessageDigest per document — w=16
  * pushes ~16× the input volume through the digest, plus a 16-byte
  * digest allocation per position. Swapping xxhash64 into the same
  * per-window structure would NOT fix that; the real fix is a rolling
  * hash, and it ships here as [[gearChunks]] (O(n): one table lookup +
  * shift + add per byte). The two paths coexist deliberately: md5 cut
  * points are what DuckDB can reproduce (the oracle twin, the
  * correctness anchor at gate SFs), gear is what a 100 TB run uses
  * (property-gated + golden-pinned, since cut points can't be pinned
  * across hash families).
  *
  * Implementation is a native Catalyst expression
  * ([[graft.plans.CdcChunksExpr]]) — NOT nested higher-order array
  * expressions (Spark's array lambdas run interpreted and don't share
  * subexpressions across lambda invocations, so the cut list would be
  * re-derived per emitted chunk — quadratic per row) and NOT a ScalaUDF
  * (which would transcode UTF8String → String per row and break
  * whole-stage codegen). The kernel walks the value's raw UTF-8 bytes
  * once: O(w·n) hashing per row, window slices taken straight off the
  * unsafe buffer. Chunking is therefore map-only at scan speed; the
  * only exchange in the family is the chunk-keyed aggregate corpus
  * dedup genuinely requires, and its key can be narrowed to
  * xxhash64(chunk) when shuffle volume matters more than
  * collision-auditability.
  *
  * Positions are Unicode code points (not UTF-16 chars, not bytes) to
  * match `substring` semantics in Spark SQL and DuckDB exactly.
  */
object Cdc {

  /** The chunk list of `text` as a column. `maxHexPrefix` is the
    * 2-hex-char inclusive upper bound on the md5 prefix — "07" accepts
    * 8 of 256 first bytes, i.e. expected chunk length ≈ 32 chars.
    * Registers the graft native functions on the active session (the
    * call_function name resolves at analysis time).
    */
  def chunks(text: Column, w: Int = 16, maxHexPrefix: String = "07"): Column = {
    require(w >= 2, s"gram width must be >= 2, got $w")
    require(maxHexPrefix.length == 2,
      s"threshold must be exactly 2 hex chars (one byte), got '$maxHexPrefix'")
    val maxFirstByte = Integer.parseInt(maxHexPrefix, 16)
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("cdc_chunks", text, lit(w), lit(maxFirstByte))
  }

  /** Gear rolling-hash chunks — the production-cost-model path
    * ([[graft.plans.GearChunksExpr]]): one table lookup + shift + add
    * per byte, O(n) per document vs the md5 path's O(w·n) through
    * MessageDigest. Cut points differ from [[chunks]] by construction
    * (different hash family), so this path is gated by CdcSpec's
    * property battery (cover invariant, size bounds, edit locality,
    * UTF-8 safety) and the q_cdc_gear golden pins, with the md5 path
    * kept as the cross-engine oracle twin. Sizes are BYTES (the unit a
    * chunk store provisions by); string chunks snap forward to
    * code-point boundaries, so the ceiling overshoots by ≤ 3 bytes.
    */
  def gearChunks(text: Column, maskBits: Int = 5, minSize: Int = 16,
      maxSize: Int = 128): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("gear_chunks", text, lit(maskBits), lit(minSize), lit(maxSize))
  }

  /** Document-containment pairs via shared chunk mass: pairs (a, b)
    * where the characters of their common DISTINCT chunks cover at
    * least `threshold` of the smaller document — the "doc A quotes /
    * mirrors most of doc B" detector, complementary to MinHash (which
    * measures symmetric Jaccard and misses asymmetric containment) and
    * to winnowing pairs (which sample fingerprints; this measures the
    * exact shared char mass over the CDC partition).
    *
    * Scale shape: chunks with document frequency > `maxChunkDf` are
    * excluded before the self-join (the MOSS move — ubiquitous
    * boilerplate chunks would otherwise square the join and tell you
    * nothing about any single pair), which caps the join's per-key
    * fan-out at maxChunkDf²; both join sides share one chunk-keyed
    * partitioning (self-join on the same frame ⇒ the exchange is
    * planned once and reused). Containment is an underestimate for
    * pairs whose overlap is mostly df-pruned boilerplate — by design.
    * A chunk repeated WITHIN a document also counts once (the distinct
    * chunk set is the unit), so scores are set-containment over chunk
    * vocabulary mass, not positional coverage.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, w: Int = 16, maxHexPrefix: String = "07",
      maxChunkDf: Int = 20, hashKey: Boolean = false): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val eStr = df.select(col(idCol).as("__id"), length(col(textCol)).as("__n"),
        explode(chunks(col(textCol), w, maxHexPrefix)).as("chunk"))
      .distinct()
    // hashKey: shuffle 8-byte keys + a length instead of ~expected-32-char
    // chunk strings (the q_substr_hash_agree discipline — string-keyed
    // path stays under the oracle at the gate SFs; a 64-bit collision at
    // corpus scale is ~|chunks|²/2⁶⁴ and CdcSpec pins hashed == string)
    val e =
      if (hashKey)
        eStr.select(col("__id"), col("__n"),
          xxhash64(col("chunk")).as("chunk"), length(col("chunk")).as("__clen"))
      else eStr.withColumn("__clen", length(col("chunk")))
    val keep = e.groupBy(col("chunk")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxChunkDf).select("chunk")
    val kept = e.join(keep, Seq("chunk"))
    val a = kept.select(col("chunk"), col("__clen"),
      col("__id").as("id_a"), col("__n").as("__na"))
    val b = kept.select(col("chunk"), col("__id").as("id_b"), col("__n").as("__nb"))
    a.join(b, Seq("chunk")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__clen")).as("shared_chars"),
        min(col("__na")).as("__na"), min(col("__nb")).as("__nb"))
      .withColumn("containment",
        round(col("shared_chars").cast("double") /
          least(col("__na"), col("__nb")), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared_chars"), col("containment"))
  }

  /** Corpus-level chunk dedup stats: one row per distinct chunk with its
    * occurrence count, distinct-document spread, length, and the chars a
    * chunk-store would save by keeping one copy. ONE hash aggregate
    * keyed on the chunk text.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, maxHexPrefix: String = "07"): DataFrame =
    df.select(col(idCol), explode(chunks(col(textCol), w, maxHexPrefix)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(idCol)).as("n_docs"))
      .select(col("chunk"), length(col("chunk")).as("chunk_len"),
        col("n_occ"), col("n_docs"),
        ((col("n_occ") - 1) * length(col("chunk"))).as("chars_saved"))
}
