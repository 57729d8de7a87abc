package graft.queries

/** Learned-artifact stash for oracle interpolation — what turns the two
  * driver-side training loops (BPE merge learning, logistic-regression
  * gradient descent) from rows-only/golden rows into full DuckDB oracle
  * rows.
  *
  * The training LOOP is not SQL-expressible, but its RESULT is a small
  * deterministic artifact (a 50-pair merge list; 256 quantized-Long
  * weights + a bias), and everything downstream of the artifact —
  * tokenization, greedy merge application, feature hashing, the margin
  * sum, chunking, packing — is exactly restatable in SQL. The queries
  * stash their artifacts here at run time; [[graft.SparkEntry.oracleSql]]
  * (a def, evaluated by Verify AFTER the queries ran) emits oracle SQL
  * with the artifact as literals. The oracle then independently replays
  * the full application path from the raw parquet tables: a wrong
  * tokenizer, a wrong merge application, a drifted hash, or a lost row
  * all hash-break, and only the 50/257 literal numbers themselves are
  * taken from the run. Training determinism stays separately pinned
  * (BpeSpec's paper example, ClassifierSpec's reference arithmetic, and
  * the GoldenGate per-sf output hashes, which remain in force).
  *
  * If a query did not run in this JVM (filtered Verify, spec runs), its
  * entry is simply absent and the driver records the old rows-only
  * check — graceful degradation, never a wrong oracle.
  */
object OracleStash {

  // Every stash is keyed by the DATA DIR the artifact was learned from
  // (round-14 ADVICE #4): a JVM that runs queries at more than one SF
  // (the Bench warm-pass pattern) holds one artifact per (query, dir)
  // instead of silently overwriting, and oracle emission below resolves
  // exactly one dir — loudly, never by accident.
  private val bpeMerges =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private val lrModel =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[Long])]()
  private val ivfCents =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[(Long, Seq[Float])]]()
  private val hypWeights =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Array[Double]]]()

  private val pcaProj =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Seq[Double], Double)]]()

  /** PCA projection model for q_pca_project: per component, the
    * eigenvector and its precomputed mean-dot bias (bias is summed
    * driver-side in the model's own association order, so only the
    * 64-term data dot is restated in SQL).
    */
  def putPcaProjection(dir: String, comps: Seq[(Seq[Double], Double)]): Unit =
    { pcaProj.put(dir, comps): Unit }

  private val pqBooks =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Float]]]]()

  /** PQ codebooks for q_ann_pq: cents(j)(c) = subspace-j centroid c
    * (dsub floats). The per-subspace k-means is a deterministic driver
    * loop (seeded, hash-ordered sample) — stashed; encode + ADC + exact
    * re-rank replay in SQL.
    */
  def putPqCodebooks(dir: String, cents: Seq[Seq[Seq[Float]]]): Unit =
    { pqBooks.put(dir, cents): Unit }

  private val pcaSpec =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Double, Double)]]()

  /** PCA spectrum artifacts for q_pca_spectrum: per component, the
    * eigenvalue and its running cumulative sum (both driver-side, in
    * the model's own association order). The DATA path the oracle
    * re-derives is the covariance TRACE from exact quantized moments —
    * the shares' denominator.
    */
  def putPcaSpectrum(dir: String, evs: Seq[(Double, Double)]): Unit =
    { pcaSpec.put(dir, evs): Unit }

  /** The dir whose artifacts [[dynamicOracles]] emits. Verify declares
    * it (the one SF its queries and oracle dump share); without a
    * declaration, a single-dir stash resolves itself and a multi-dir
    * stash refuses.
    */
  @volatile private var emitDir: Option[String] = None
  def setEmitDir(dir: String): Unit = { emitDir = Some(dir) }

  /** Hyperplane weight matrix for `query` (q_ann_lsh probes 12x6 bits,
    * q_cosine_neardup bands 12x5 — different geometries, same family).
    */
  def putHyperplaneWeights(query: String, dir: String, w: Array[Array[Double]]): Unit =
    { hypWeights.put((query, dir), w): Unit }

  def putBpeMerges(dir: String, merges: Seq[(String, String)]): Unit =
    { bpeMerges.put(dir, merges): Unit }
  def putLrModel(dir: String, biasNano: Long, weightNanos: Array[Long]): Unit =
    { lrModel.put(dir, (biasNano, weightNanos.clone())): Unit }
  /** IVF centroid model for `query` (q_ann_ivf / q_ann_ivf_persist train
    * DIFFERENT models — full corpus vs the 80% build slice).
    */
  def putIvfCentroids(query: String, dir: String, cents: Seq[(Long, Seq[Float])]): Unit =
    { ivfCents.put((query, dir), cents): Unit }

  /** SQL string literal with single quotes escaped. */
  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---- BPE: tokenize → greedy merge application, all in SQL ------------
  //
  // A word's symbol sequence rides ONE delimited string: every symbol is
  // wrapped as <US>sym<US> (US = chr(31), absent from \S+ tokens of the
  // ASCII corpus) and the wrapped symbols concatenated. One learned merge
  // (a, b) is then EXACTLY DuckDB's replace(s, '<US>a<US><US>b<US>',
  // '<US>ab<US>'): replace scans left-to-right and continues after each
  // replacement — the same greedy non-overlapping pass
  // BpeTrainer.encodeWord runs — and the full wrapping makes a partial
  // token-boundary match impossible. 50 merges = 50 nested replaces.

  private val US = "chr(31)"

  /** Initial wrapped-symbol string for a word `w`: chars + '</w>'. */
  private def bpeInitSql(w: String): String =
    s"$US || array_to_string(list_append(" +
      s"[substr($w, i, 1) FOR i IN range(1, len($w) + 1)], '</w>'), " +
      s"$US || $US) || $US"

  /** Nested replaces applying the learned merges in order. */
  private def bpeApplySql(expr: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(expr) { case (acc, (a, b)) =>
      s"replace($acc,\n      $US || ${sq(a)} || $US || $US || ${sq(b)} || $US," +
        s" $US || ${sq(a + b)} || $US)"
    }

  /** Shared prefix: distinct words → encoded subword lists, then doc
    * occurrences joined back in order. `occ` = (doc_id, i, w);
    * `enc` = (w, syms LIST, n_sub); `ds` = (doc_id, n_tokens,
    * n_subwords, subs LIST — the doc's flat subword sequence).
    */
  private def bpeCtes(merges: Seq[(String, String)]): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS ws
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, i, ws[i] AS w
       |  FROM toks, unnest(range(1, len(ws) + 1)) AS u(i)),
       |dw AS (SELECT DISTINCT w FROM occ),
       |enc0 AS (
       |  SELECT w, ${bpeApplySql(bpeInitSql("w"), merges)} AS s FROM dw),
       |enc AS (
       |  SELECT w, string_split(substr(s, 2, len(s) - 2), $US || $US) AS syms
       |  FROM enc0),
       |ds AS (
       |  SELECT occ.doc_id,
       |    count(*) AS n_tokens,
       |    CAST(sum(len(enc.syms)) AS BIGINT) AS n_subwords,
       |    flatten(list(enc.syms ORDER BY occ.i)) AS subs
       |  FROM occ JOIN enc USING (w)
       |  GROUP BY occ.doc_id)""".stripMargin

  /** q_bpe_tokenize: (doc_id, n_tokens, n_subwords) per doc. Docs whose
    * tokenization is empty keep (0, 0) — tokenize() emits them too.
    */
  private def bpeTokenizeSql(merges: Seq[(String, String)]): String =
    s"""WITH ${bpeCtes(merges)}
       |SELECT t.doc_id,
       |  CAST(coalesce(ds.n_tokens, 0) AS INT) AS n_tokens,
       |  CAST(coalesce(ds.n_subwords, 0) AS INT) AS n_subwords
       |FROM toks t LEFT JOIN ds USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** q_tokenize_pack: subword stream → 32/32 chunks → ord = doc*1000 +
    * chunk_idx → 256-capacity packing → per-bin stats, the exact
    * Chunking.chunkByTokens / Packing.packBySize / packStats algebra
    * (the q_chunk_windows and q_pack_sequences oracle shapes composed).
    */
  private def tokenizePackSql(merges: Seq[(String, String)]): String =
    s"""WITH ${bpeCtes(merges)},
       |chunks AS (
       |  SELECT doc_id, CAST(start // 32 AS INT) AS chunk_idx,
       |    CAST(least(start + 32, len(subs)) - start AS INT) AS n_tokens
       |  FROM (SELECT doc_id, subs, unnest(range(0, len(subs), 32)) AS start
       |        FROM ds)
       |  WHERE start = 0 OR start < len(subs)),
       |ordc AS (
       |  SELECT doc_id * 1000 + chunk_idx AS ord, n_tokens FROM chunks),
       |packed AS (
       |  SELECT ord, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM ordc)
       |SELECT CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS bin,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |  round(sum(n_tokens) / 256.0, 6) AS fill
       |FROM packed GROUP BY 1 ORDER BY bin""".stripMargin

  // ---- logistic scoring: MurmurHash3 + margin fold in SQL --------------
  //
  // Scala's MurmurHash3.stringHash(token, 42) restated as wrapping 32-bit
  // arithmetic over BIGINT/HUGEINT values in [0, 2^32): multiplies go
  // through HUGEINT and reduce mod 2^32, rotations split into the two
  // disjoint shifted halves, >>> is integer division. The bucket is the
  // hash's low 8 bits (dim = 256 is a power of two, so Scala's
  // ((h % dim) + dim) % dim on the signed int equals the unsigned low
  // byte). The margin then replays scoreLogistic's EXACT double-add
  // order: bias/1e9 followed by the occupied buckets' weights ascending.

  private def mul32(x: String, c: Long): String =
    s"CAST((CAST($x AS HUGEINT) * $c) % 4294967296 AS BIGINT)"
  private def rotl32(x: String, r: Int): String =
    s"((($x * ${1L << r}) % 4294967296) + ($x // ${1L << (32 - r)}))"
  /** mixLast(h, d): h XOR (rotl(d*c1, 15) * c2). */
  private def mixLast(h: String, d: String): String =
    s"xor($h, ${mul32(rotl32(mul32(d, 3432918353L), 15), 461845907L)})"
  /** mix(h, d): rotl(mixLast, 13) * 5 + 0xe6546b64. */
  private def mix(h: String, d: String): String =
    s"((${rotl32(mixLast(h, d), 13)} * 5 + 3864292196) % 4294967296)"

  private def lrScoreSql(biasNano: Long, weightNanos: Array[Long]): String = {
    val wlist = weightNanos.mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS ws
       |  FROM documents),
       |dtok AS (
       |  SELECT DISTINCT unnest(ws) AS token FROM toks),
       |hp AS (
       |  SELECT token, len(token) AS n,
       |    list_reduce(
       |      list_prepend(CAST(42 AS BIGINT),
       |        [CAST(unicode(substr(token, 2 * j + 1, 1)) * 65536
       |              + unicode(substr(token, 2 * j + 2, 1)) AS BIGINT)
       |         FOR j IN range(0, len(token) // 2)
       |         IF 2 * j + 2 <= len(token)]),
       |      (h, d) -> ${mix("h", "d")}) AS h0
       |  FROM dtok),
       |hm AS (
       |  SELECT token, n,
       |    CASE WHEN n % 2 = 1 THEN
       |      ${mixLast("h0", "CAST(unicode(substr(token, n, 1)) AS BIGINT)")}
       |    ELSE h0 END AS h1
       |  FROM hp),
       |f0 AS (SELECT token, xor(h1, n) AS a0 FROM hm),
       |f1 AS (SELECT token, xor(a0, a0 // 65536) AS a1 FROM f0),
       |f2 AS (SELECT token, ${mul32("a1", 2246822507L)} AS a2 FROM f1),
       |f3 AS (SELECT token, xor(a2, a2 // 8192) AS a3 FROM f2),
       |f4 AS (SELECT token, ${mul32("a3", 3266489909L)} AS a4 FROM f3),
       |tb AS (SELECT token, CAST(xor(a4, a4 // 65536) % 256 AS INT) AS bucket
       |       FROM f4),
       |occ AS (SELECT doc_id, unnest(ws) AS token FROM toks),
       |db AS (SELECT DISTINCT occ.doc_id, tb.bucket
       |       FROM occ JOIN tb USING (token)),
       |wts AS (SELECT $wlist AS wl),
       |z AS (
       |  SELECT db.doc_id,
       |    list_reduce(
       |      list_prepend($biasNano / 1e9,
       |        list(wts.wl[db.bucket + 1] / 1e9 ORDER BY db.bucket)),
       |      (a, b) -> a + b) AS zv
       |  FROM db CROSS JOIN wts GROUP BY db.doc_id),
       |sc AS (
       |  SELECT t.doc_id,
       |    round(1.0 / (1.0 + exp(-coalesce(z.zv, $biasNano / 1e9))), 6)
       |      AS quality_score
       |  FROM toks t LEFT JOIN z USING (doc_id))
       |SELECT doc_id, quality_score,
       |  CAST(quality_score >= 0.5 AS INT) AS pred
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---- IVF ANN: stashed centroid model, full probe replay in SQL ------
  //
  // The centroid TRAINING (hash-ordered sample, k-means++ with a seeded
  // RNG, Lloyd rounds) is a deterministic driver loop — stashed as
  // literals, separately pinned by the GoldenGate hashes and OpsSpec.
  // Everything downstream is restated: every vector's argmax cell
  // (unrounded cosine, ties to the smallest cell — the max_by order
  // key), each query's nProbe=4 nearest cells (same tie-break), the
  // self-excluded candidate set from the probed cells, the rounded
  // exact re-rank, and the (sim DESC, neighbor_id) top-5 — the same
  // cosine spelling the long-green q_ann_bruteforce oracle uses, so a
  // hash match certifies the whole IVF pipeline given the model.
  // Centroid floats are emitted via Double.toString of their exact
  // double widening (shortest-repr FLOAT strings would re-round
  // differently when DuckDB parses them as DOUBLE).
  private def cos(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |      i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       |    / nullif(sqrt(list_sum(list_transform(generate_series(1, 64),
       |      i -> $a[i]::DOUBLE * $a[i]::DOUBLE))) *
       |      sqrt(list_sum(list_transform(generate_series(1, 64),
       |      i -> $b[i]::DOUBLE * $b[i]::DOUBLE))), 0)""".stripMargin

  /** Shared final stages: self-excluded candidates → rounded exact
    * re-rank → (sim DESC, neighbor_id) top-5 — the q_ann_bruteforce
    * oracle discipline. `candCte` must define cand(query_id, neighbor_id).
    */
  private def annRerankSql(extraCols: String): String =
    s"""scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    round(coalesce(${cos("q.embedding", "n.embedding")}, 0.0), 6) AS sim
       |  FROM cand c
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |  JOIN embeddings n ON n.vec_id = c.neighbor_id)
       |SELECT query_id, neighbor_id, sim, rank$extraCols FROM (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def ivfSql(cents: Seq[(Long, Seq[Float])], extraCols: String): String = {
    val rows = cents.map { case (cell, v) =>
      s"(CAST($cell AS BIGINT), [${v.map(_.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n      ")
    s"""WITH cent(cell, cv) AS (VALUES
       |      $rows),
       |ccs AS (
       |  SELECT e.vec_id AS nid, cent.cell,
       |    coalesce(${cos("e.embedding", "cent.cv")}, 0.0) AS csim
       |  FROM embeddings e CROSS JOIN cent),
       |casg AS (
       |  SELECT nid, cell FROM (
       |    SELECT nid, cell, ROW_NUMBER() OVER (PARTITION BY nid
       |      ORDER BY csim DESC, cell) AS rn
       |    FROM ccs) t WHERE rn = 1),
       |qsel AS (
       |  SELECT nid AS query_id, cell FROM (
       |    SELECT nid, cell, ROW_NUMBER() OVER (PARTITION BY nid
       |      ORDER BY csim DESC, cell) AS rn
       |    FROM ccs WHERE nid < 10) t WHERE rn <= 4),
       |cand AS (
       |  SELECT DISTINCT q.query_id, a.nid AS neighbor_id
       |  FROM qsel q JOIN casg a USING (cell)
       |  WHERE a.nid <> q.query_id),
       |${annRerankSql(extraCols)}""".stripMargin
  }

  /** q_semantic_dedup: the SemDeDup drop set replayed from the stashed
    * 8-centroid model — every vector's argmax cell (unrounded cosine,
    * ties to the smallest cell: the max_by(struct(csim, -cell)) order),
    * all WITHIN-CELL pairs at rounded cosine ≥ 0.35 (the grid split is
    * an execution detail — every intra-cell pair meets in exactly one
    * task, so the pair SET is grid-free), transitive-closure components
    * with min-id labels, survivors = everything except non-min members.
    */
  private def semDedupSql(cents: Seq[(Long, Seq[Float])]): String = {
    val rows = cents.map { case (cell, v) =>
      s"(CAST($cell AS BIGINT), [${v.map(_.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n      ")
    s"""WITH RECURSIVE cent(cell, cv) AS (VALUES
       |      $rows),
       |ccs AS (
       |  SELECT e.vec_id AS nid, cent.cell,
       |    coalesce(${cos("e.embedding", "cent.cv")}, 0.0) AS csim
       |  FROM embeddings e CROSS JOIN cent),
       |casg AS (
       |  SELECT nid, cell FROM (
       |    SELECT nid, cell, ROW_NUMBER() OVER (PARTITION BY nid
       |      ORDER BY csim DESC, cell) AS rn
       |    FROM ccs) t WHERE rn = 1),
       |vpairs AS MATERIALIZED (
       |  SELECT a.nid AS id_a, b.nid AS id_b
       |  FROM casg a JOIN casg b USING (cell)
       |  JOIN embeddings x ON x.vec_id = a.nid
       |  JOIN embeddings y ON y.vec_id = b.nid
       |  WHERE a.nid < b.nid
       |    AND round(coalesce(${cos("x.embedding", "y.embedding")}, 0.0), 6) >= 0.35),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM vpairs
       |  UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT e.vec_id FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
       |WHERE c.id IS NULL OR c.component = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  /** q_pca_project: every row's top-k projections replayed from the
    * stashed eigenvector/bias literals — pc_i = dot(v, comp_i) − bias_i
    * rounded at 6, the exact [[graft.ops.Pca.project]] arithmetic (the
    * dot is the same left-to-right 64-term double sum the ANN oracles
    * already hash-match). The eigensolve itself stays GoldenGate-pinned;
    * the oracle certifies the distributed application path over every
    * raw embedding.
    */
  private def pcaProjectSql(comps: Seq[(Seq[Double], Double)]): String = {
    val pcCols = comps.zipWithIndex.map { case ((cv, bias), i) =>
      val lits = cv.map(_.toString).mkString("[", ", ", "]")
      s"round(list_sum(list_transform(generate_series(1, ${cv.length}), " +
        s"i -> e.embedding[i]::DOUBLE * ($lits)[i])) - ($bias), 6) AS pc_${i + 1}"
    }.mkString(",\n  ")
    s"""SELECT e.vec_id, e.label,
       |  $pcCols
       |FROM embeddings e ORDER BY e.vec_id""".stripMargin
  }

  /** q_pca_spectrum: the eigenvalues (and their running sums) are
    * driver-Jacobi artifacts — literals; the explained-variance shares'
    * denominator is the covariance TRACE, which the oracle re-derives
    * from raw embeddings through the exact quantized-moment arithmetic
    * ([[graft.ops.Pca.MomentsAggregator]]: per-row floor(x·2^24) /
    * floor(x²·2^24) integer sums — the q_pca_moments discipline), with
    * every double division and the i-ordered trace sum replayed in the
    * kernel's own association order. A drifted moment pass, a lost row
    * or a wrong normalization moves every share and hash-breaks.
    */
  private def pcaSpectrumSql(evs: Seq[(Double, Double)]): String = {
    val rows = evs.zipWithIndex.map { case ((ev, cum), i) =>
      s"(CAST(${i + 1} AS INT), CAST($ev AS DOUBLE), CAST($cum AS DOUBLE))"
    }.mkString(",\n      ")
    s"""WITH mo AS (
       |  SELECT i,
       |    SUM(CAST(floor(embedding[i]::DOUBLE * 16777216) AS BIGINT)) AS q1,
       |    SUM(CAST(floor(embedding[i]::DOUBLE * embedding[i]::DOUBLE * 16777216) AS BIGINT)) AS q2,
       |    COUNT(*) AS n
       |  FROM embeddings, unnest(generate_series(1, 64)) AS u(i)
       |  WHERE embedding IS NOT NULL AND len(embedding) = 64
       |  GROUP BY i),
       |tr AS (
       |  SELECT list_sum(list(term ORDER BY i)) AS trace FROM (
       |    SELECT i,
       |      ((q2::DOUBLE / 16777216)
       |        - n * ((q1::DOUBLE / 16777216) / n) * ((q1::DOUBLE / 16777216) / n))
       |        / (n - 1) AS term
       |    FROM mo)),
       |ev(component, ev, cum) AS (VALUES
       |      $rows)
       |SELECT ev.component,
       |  round(ev.ev, 9) AS eigenvalue,
       |  round(ev.ev / tr.trace, 9) AS var_share,
       |  round(ev.cum / tr.trace, 9) AS cum_share
       |FROM ev CROSS JOIN tr ORDER BY ev.component""".stripMargin
  }

  /** q_ann_pq: the full PQ/ADC pipeline from the stashed codebooks —
    * float-normalize every vector (the CAST to FLOAT replays the
    * kernel's (x/n).toFloat rounding; zero norms pass through raw),
    * encode = per-subspace argmin squared L2 against the centroid
    * literals (ties to the smallest code), per-query subspace lookup
    * tables as the same left-to-right 8-term double dots, ADC = the
    * j-ordered sum of table entries, self-excluded top-(k·rerank)
    * shortlist by (adc DESC, id), then the shared exact re-rank
    * ([[annRerankSql]], top-5 rounded cosine). Geometry fixed by the
    * gate: m=8, dsub=8, k=5, rerankFactor=16.
    */
  private def pqSql(cents: Seq[Seq[Seq[Float]]]): String = {
    val rows = (for {
      (book, j) <- cents.zipWithIndex
      (cv, c) <- book.zipWithIndex
    } yield s"($j, $c, [${cv.map(_.toDouble.toString).mkString(", ")}])")
      .mkString(",\n      ")
    s"""WITH cent(j, c, cv) AS (VALUES
       |      $rows),
       |en AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(generate_series(1, 64),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
       |  FROM embeddings),
       |nv AS (
       |  SELECT vec_id,
       |    list_transform(generate_series(1, 64), i ->
       |      CASE WHEN nrm = 0 THEN embedding[i]::DOUBLE
       |           ELSE CAST(CAST(embedding[i]::DOUBLE / nrm AS FLOAT) AS DOUBLE)
       |      END) AS v
       |  FROM en),
       |dist AS (
       |  SELECT n.vec_id, cent.j, cent.c,
       |    list_sum(list_transform(generate_series(1, 8), q ->
       |      (n.v[cent.j * 8 + q] - cent.cv[q]) * (n.v[cent.j * 8 + q] - cent.cv[q]))) AS d
       |  FROM nv n CROSS JOIN cent),
       |codes AS (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
       |    FROM dist) t WHERE rn = 1),
       |lut AS (
       |  SELECT n.vec_id AS query_id, cent.j, cent.c,
       |    list_sum(list_transform(generate_series(1, 8), q ->
       |      n.v[cent.j * 8 + q] * cent.cv[q])) AS dp
       |  FROM nv n CROSS JOIN cent WHERE n.vec_id < 10),
       |adc AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    list_sum(list(l.dp ORDER BY l.j)) AS adc_sim
       |  FROM codes co JOIN lut l ON l.j = co.j AND l.c = co.c
       |  WHERE l.query_id <> co.vec_id
       |  GROUP BY l.query_id, co.vec_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc_sim DESC, neighbor_id) AS rn
       |    FROM adc) t WHERE rn <= 80),
       |${annRerankSql("")}""".stripMargin
  }

  /** q_ann_lsh: hyperplane sign signatures replayed from the stashed
    * weight matrix (72 global bits × 64 dims — deterministic splitmix
    * weights, stashed because restating 64-bit wrapping splitmix in SQL
    * buys nothing over literals), bucketed into 12 bands of 6 bits,
    * exact-bucket candidate join (multiProbe = false in the gate),
    * then the shared re-rank.
    */
  private def lshSql(w: Array[Array[Double]]): String = {
    val rows = w.zipWithIndex.map { case (v, g) =>
      s"(CAST($g AS BIGINT), [${v.map(_.toString).mkString(", ")}])"
    }.mkString(",\n      ")
    s"""WITH w(g, wv) AS (VALUES
       |      $rows),
       |bits AS (
       |  SELECT e.vec_id AS id, w.g // 6 AS band,
       |    CASE WHEN list_sum(list_transform(generate_series(1, 64),
       |        i -> e.embedding[i]::DOUBLE * w.wv[i])) >= 0
       |      THEN (CAST(1 AS BIGINT) << CAST(w.g % 6 AS INT)) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN w),
       |bk AS (
       |  SELECT id, band, CAST(SUM(bit) AS BIGINT) AS bucket
       |  FROM bits GROUP BY id, band),
       |cand AS (
       |  SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
       |  FROM bk q JOIN bk c USING (band, bucket)
       |  WHERE q.id < 10 AND c.id <> q.id),
       |${annRerankSql("")}""".stripMargin
  }

  /** q_cosine_neardup: the same weight family bucketed as 12 bands of
    * 5 bits, all-pairs (id_a < id_b) exact-bucket candidates, verified
    * with the rounded cosine at threshold 0.35 — the self-join twin of
    * [[lshSql]].
    */
  private def cosNeardupSql(w: Array[Array[Double]]): String = {
    val rows = w.zipWithIndex.map { case (v, g) =>
      s"(CAST($g AS BIGINT), [${v.map(_.toString).mkString(", ")}])"
    }.mkString(",\n      ")
    s"""WITH w(g, wv) AS (VALUES
       |      $rows),
       |bits AS (
       |  SELECT e.vec_id AS id, w.g // 5 AS band,
       |    CASE WHEN list_sum(list_transform(generate_series(1, 64),
       |        i -> e.embedding[i]::DOUBLE * w.wv[i])) >= 0
       |      THEN (CAST(1 AS BIGINT) << CAST(w.g % 5 AS INT)) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN w),
       |bk AS (
       |  SELECT id, band, CAST(SUM(bit) AS BIGINT) AS bucket
       |  FROM bits GROUP BY id, band),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bk a JOIN bk b USING (band, bucket)
       |  WHERE a.id < b.id),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    round(coalesce(${cos("x.embedding", "y.embedding")}, 0.0), 6) AS sim
       |  FROM cand c
       |  JOIN embeddings x ON x.vec_id = c.id_a
       |  JOIN embeddings y ON y.vec_id = c.id_b)
       |SELECT id_a, id_b, sim FROM scored
       |WHERE sim >= 0.35 ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle entries for whichever artifacts this JVM's query runs
    * stashed — evaluated by SparkEntry.oracleSql AFTER Verify ran the
    * queries.
    */
  def dynamicOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val dirs = (bpeMerges.keySet.asScala.toSet ++ lrModel.keySet.asScala.toSet ++
      ivfCents.keySet.asScala.map(_._2) ++ hypWeights.keySet.asScala.map(_._2) ++
      pcaProj.keySet.asScala.toSet ++ pqBooks.keySet.asScala.toSet ++
      pcaSpec.keySet.asScala.toSet)
    if (dirs.isEmpty) return Map.empty
    val dir = emitDir
      .orElse(if (dirs.size == 1) dirs.headOption else None)
      .getOrElse(throw new IllegalStateException(
        "OracleStash: artifacts stashed for multiple data dirs " +
        s"(${dirs.toSeq.sorted.mkString(", ")}) and no emit dir declared — " +
        "a multi-SF JVM must call OracleStash.setEmitDir(<sfDir>) (Verify " +
        "does) before evaluating oracleSql, or the oracle would pair one " +
        "SF's SQL with another SF's learned artifacts"))
    val b = Map.newBuilder[String, String]
    Option(bpeMerges.get(dir)).foreach { m =>
      b += ("q_bpe_tokenize" -> bpeTokenizeSql(m))
      b += ("q_tokenize_pack" -> tokenizePackSql(m))
    }
    Option(lrModel.get(dir)).foreach { case (bias, w) =>
      b += ("q_lr_quality" -> lrScoreSql(bias, w))
    }
    Option(ivfCents.get(("q_ann_ivf", dir))).foreach(c =>
      b += ("q_ann_ivf" -> ivfSql(c, "")))
    Option(ivfCents.get(("q_semantic_dedup", dir))).foreach(c =>
      b += ("q_semantic_dedup" -> semDedupSql(c)))
    Option(pcaProj.get(dir)).foreach(c =>
      b += ("q_pca_project" -> pcaProjectSql(c)))
    Option(pqBooks.get(dir)).foreach(c =>
      b += ("q_ann_pq" -> pqSql(c)))
    Option(pcaSpec.get(dir)).foreach(c =>
      b += ("q_pca_spectrum" -> pcaSpectrumSql(c)))
    Option(ivfCents.get(("q_ann_ivf_persist", dir))).foreach(c =>
      b += ("q_ann_ivf_persist" -> ivfSql(c, ", true AS append_eq_rebuild")))
    Option(hypWeights.get(("q_ann_lsh", dir))).foreach(w =>
      b += ("q_ann_lsh" -> lshSql(w)))
    Option(hypWeights.get(("q_cosine_neardup", dir))).foreach(w =>
      b += ("q_cosine_neardup" -> cosNeardupSql(w)))
    b.result()
  }
}
