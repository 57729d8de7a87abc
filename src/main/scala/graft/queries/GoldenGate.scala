package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-verifying gate for queries that are deterministic by construction
  * but not SQL-expressible (seeded LSH, iterative training, driver merge
  * loops), so the driver can only record a rows-only check. The query
  * pins the xxhash64 of its own output per scale factor: compute →
  * require → emit. A semantics change — different scores, different
  * merge order, a lost row — breaks the round loudly instead of sliding
  * through as "rows > 0".
  *
  * The row hash folds with BIT_XOR (order-independent, overflow-free
  * under ANSI; every pinned output carries a unique id/pair key so
  * self-cancellation can't occur). SparkEntry applies the gate to EVERY
  * registered query by name: queries without a pinned (name, sf) entry —
  * all oracle-backed queries, and every query at the bench's sf0.1 —
  * pass through untouched, no extra job, no cache.
  *
  * Pin discipline: every constant below was derived from two independent
  * JVM runs (hash equality across runs is the determinism check) and
  * only for outputs whose determinism is by construction — integer set
  * ops, seeded hashes, driver-side seeded loops, quantized-Long sums.
  * Distributed unquantized float aggregation is NOT pinnable (partition
  * merge order moves the bits); nothing below contains one.
  */
object GoldenGate {

  /** query name -> (sf dir basename -> pinned BIT_XOR(xxhash64(row))).
    *
    * Every constant was emitted by [[graft.PinProbe]] in four separate
    * JVMs (local[4]/shuffle=4 and local[16]/shuffle=16, at each sf) and
    * matched across all four — partition count changes merge order, so
    * agreement is direct evidence that no tie-break or accumulation in
    * the query is partition-order-sensitive. With these, every formerly
    * rows-only query except the two measured-recall artifacts (which
    * are oracle-backed) is self-verifying at the driver's gate sf.
    */
  private val Pins: Map[String, Map[String, Long]] = Map(
    // fixed-level raw deflate over UTF-8 bytes (JVM zlib; determinism
    // within the container is the claim the pin asserts)
    "q_compression_ratio" -> Map(
      "sf0.001" -> 5659351399849157726L,
      "sf0.01" -> -1003849550103307618L),
    // quantized-Long gradient training — bit-reproducible scores. ALSO
    // oracle-backed since round 14 (OracleStash restates the scoring
    // path with the learned weights as literals); the pin stays as
    // defense-in-depth over the training loop itself
    "q_lr_quality" -> Map(
      "sf0.001" -> 593451318610010724L,
      "sf0.01" -> 9062431030121579018L),
    // deterministic BPE merge loop; ALSO oracle-backed since round 14
    // (OracleStash replays merge application from the learned list)
    "q_bpe_tokenize" -> Map(
      "sf0.001" -> 311557740884800157L,
      "sf0.01" -> 8502358823665122315L),
    // seeded hyperplane LSH top-k (per-row double sims, heap
    // total-ordered); ALSO oracle-backed since round 14 (OracleStash
    // replays signatures from the stashed weight matrix)
    "q_ann_lsh" -> Map(
      "sf0.001" -> -8064504202328906915L,
      "sf0.01" -> 1588868561351953551L),
    // driver-deterministic k-means cells + exact in-cell scan; ALSO
    // oracle-backed since round 14 (OracleStash replays the probe
    // pipeline with the stashed centroid model as literals)
    "q_ann_ivf" -> Map(
      "sf0.001" -> 6113114698965881482L,
      "sf0.01" -> 1996259252821340999L),
    // the same cells probed THROUGH the persisted cell-partitioned
    // index; append==rebuild parity rides in the hashed rows; ALSO
    // oracle-backed since round 14 (OracleStash, build-slice model)
    "q_ann_ivf_persist" -> Map(
      "sf0.001" -> -2425388314313340813L,
      "sf0.01" -> 7699449505327174160L),
    // hash-ordered 4096-row training sample + ADC shortlist re-rank;
    // ALSO oracle-backed since round 15 (OracleStash.pqSql replays
    // float-normalize, encode, ADC and the exact re-rank from the
    // stashed codebooks)
    "q_ann_pq" -> Map(
      "sf0.001" -> 2631537098319517309L,
      "sf0.01" -> 3833823461305376123L),
    // Gopher filter (integer rules) + Table-A1 repetition filter (round
    // 8, pins re-derived) + seeded MinHash dedup stage; ALSO
    // oracle-backed since round 15 (HashSql.cleanCorpusSql composes the
    // survivor CTEs with the MinHash election end to end)
    "q_clean_corpus" -> Map(
      "sf0.001" -> 3009267281317416306L,
      "sf0.01" -> -531134740585318274L),
    // seeded LSH candidates, exact rounded-cosine verify; ALSO
    // oracle-backed since round 14 (OracleStash weight-matrix replay)
    "q_cosine_neardup" -> Map(
      "sf0.001" -> -1167652805735308602L,
      "sf0.01" -> 7138736516249591035L),
    // seeded MinHash pairs -> components -> min-id representative; ALSO
    // oracle-backed since round 15 (HashSql.dedupCorpusSql: the full
    // 40x8 detector + MATERIALIZED-closure election in SQL)
    "q_dedup_corpus" -> Map(
      "sf0.001" -> -7066194519912670156L,
      "sf0.01" -> 5169745455655986661L),
    // seeded MinHash banding, exact hashed-shingle Jaccard verify; ALSO
    // oracle-backed since round 15 (HashSql.dedupMinhashSql re-derives
    // signatures, byte-wise band buckets and the verify from raw text)
    "q_dedup_minhash" -> Map(
      "sf0.001" -> -1369828898447798070L,
      "sf0.01" -> -468088737826377300L),
    // deterministic 64-bit signatures, 4x16-bit chunk blocking; ALSO
    // oracle-backed since round 15 (HashSql restates the full
    // token-vote signature pipeline + all-pairs Hamming verify in SQL)
    "q_dedup_simhash" -> Map(
      "sf0.001" -> 4697273878940751875L,
      "sf0.01" -> 4444710912247945519L),
    // seeded index build + probe, rounded jaccard output; ALSO
    // oracle-backed since round 15 (HashSql.incrementalDedupSql)
    "q_incremental_dedup" -> Map(
      "sf0.001" -> -3614380921660295881L,
      "sf0.01" -> 7807773766077415880L),
    // the probe THROUGH the persisted (band, bucket)-partitioned index;
    // paths_equal pins on-disk == in-memory (multiset-hash parity;
    // row-level exceptAll pin in DedupSpec); ALSO oracle-backed since
    // round 15 (same probe restatement as q_incremental_dedup — the
    // in-query parity gate extends the oracle's reach to the disk path)
    "q_dedup_index_persist" -> Map(
      "sf0.001" -> -5573654698542180147L,
      "sf0.01" -> 4017603715062287948L),
    // dHash probe THROUGH the persisted (chunk, bucket)-partitioned
    // Hamming band index; paths_equal = mem/disk multiset-hash parity;
    // ALSO oracle-backed since round 15 (the q_media_phash dHash SQL +
    // all cross-parity pairs at Hamming <= 3 — pigeonhole-complete)
    "q_phash_index_persist" -> Map(
      "sf0.001" -> -3329418933034230360L,
      "sf0.01" -> 1731462171867627892L),
    // driver-deterministic k-means cells + exact within-cell pairs;
    // ALSO oracle-backed since round 15 (OracleStash.semDedupSql replays
    // assignment, within-cell pairs and the election from the stashed
    // centroid literals)
    "q_semantic_dedup" -> Map(
      "sf0.001" -> -1100432165491027870L,
      "sf0.01" -> -5137861434621326852L),
    // md5 rank keys + group-cover assignment — integer-exact; ALSO
    // oracle-backed since round 15 (HashSql: recursive-CTE components
    // over the jaccard pairs + the hashSplit CASE on representatives)
    "q_split_leakage_safe" -> Map(
      "sf0.001" -> 8885026643837775078L,
      "sf0.01" -> -8806773357719023054L),
    // winnowed fingerprints (position-deterministic), integer pair
    // counts; ALSO oracle-backed since round 15 (HashSql restates the
    // windowed signed-min winnowing + df band + shared floor in SQL)
    "q_substring_pairs" -> Map(
      "sf0.001" -> 1666661063672788951L,
      "sf0.01" -> -6784187389549244528L),
    // BPE spine + two-phase running total — integer-exact; ALSO
    // oracle-backed since round 14 (OracleStash)
    "q_tokenize_pack" -> Map(
      "sf0.001" -> 8446402077215570318L,
      "sf0.01" -> -8775121591589721512L),
    // Gear rolling-hash CDC — integer byte counts + boolean contracts;
    // the GEAR table is SplitMix64 from a fixed seed, JVM-independent;
    // ALSO oracle-backed since round 15 (HashSql.cdcGearSql restates the
    // state machine via the gear hash's 64-byte-window algebra)
    "q_cdc_gear" -> Map(
      "sf0.001" -> 2917118337503949230L,
      "sf0.01" -> -5465476134181944840L),
    // integer counts -> per-row binomial log-odds (A9: the last §2 entry
    // without a hash-level signal, now pinned)
    "q_plogo" -> Map(
      "sf0.001" -> 7843795823847205001L,
      "sf0.01" -> 5162878873516740508L),
    // PCA: quantized-Long moments (oracle row q_pca_moments) -> driver
    // Jacobi -> per-row projections / spectrum — bit-reproducible end
    // to end, eigensolve not SQL-expressible; q_pca_project ALSO
    // oracle-backed since round 15 (OracleStash.pcaProjectSql replays
    // the per-row projection arithmetic from eigenvector literals)
    "q_pca_project" -> Map(
      "sf0.001" -> 8541896421514893595L,
      "sf0.01" -> 7597635679064844160L),
    // q_pca_spectrum ALSO oracle-backed since round 15 (eigenvalue/cum
    // literals + the trace re-derived from exact quantized moments)
    "q_pca_spectrum" -> Map(
      "sf0.001" -> -7558644478549166367L,
      "sf0.01" -> 5212120727519290290L))

  /** Gate `df` if (name, sf-of-dir) carries a pin; identity otherwise. */
  def apply(df: DataFrame, name: String, dir: String): DataFrame =
    Pins.get(name) match {
      case None => df
      case Some(golden) => apply(df, name, golden, dir)
    }

  def apply(df: DataFrame, name: String, golden: Map[String, Long], dir: String): DataFrame = {
    val sf = dir.replaceAll("/+$", "").split('/').last
    golden.get(sf) match {
      case None => df
      case Some(g) =>
        // one materialization serves both the hash job and the caller's
        // downstream consumption (Verify's parquet write)
        val pinned = df.localCheckpoint()
        val h = hashOf(pinned)
        require(h == g,
          s"$name: golden output hash mismatch for $sf — got $h, pinned $g. " +
            "The query is deterministic by construction, so this is a real " +
            "semantics change; re-derive the pin only if the change is intended.")
        pinned
    }
  }

  /** BIT_XOR-folded xxhash64 over all columns of every row. */
  def hashOf(df: DataFrame): Long = {
    val out = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)").as("x"))
      .head()
    if (out.isNullAt(0)) 0L else out.getLong(0)
  }
}
