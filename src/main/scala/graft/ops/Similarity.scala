package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Three tiers, same output contract (query_id, neighbor_id, sim, rank):
  *  - `bruteForceTopK`: exact; broadcast the (small) query set against the
  *    corpus — map-side cosine + per-query top-k. Correct baseline.
  *
  * All three rank candidates through `TopKAggregator.topKByGroup` — a
  * bounded-heap aggregate with map-side combine — never a per-query
  * window sort (each query's full candidate set through one task).
  *  - `lshTopK`: random-hyperplane LSH — corpus is bucketed by per-band
  *    sign-bit buckets, candidates come from matching buckets only; the
  *    shuffle is keyed by (band, bucket), never all-pairs.
  *  - `ivfTopK`: IVF — spherical-k-means centroids trained on a bounded
  *    sample, corpus assigned to its nearest cell once, queries probe the
  *    nProbe nearest cells. Bounded candidate sets with data-adaptive
  *    partitioning.
  *
  * == Hyperplane-LSH collision math (governs every band knob below) ==
  * For two vectors at cosine s, a random hyperplane splits them with
  * probability θ/π (θ = arccos s), so one signature bit agrees with
  *   p(s) = 1 − arccos(s)/π.
  * A band of r bits collides with p^r; with B independent bands (disjoint
  * hyperplanes) the candidate probability is the S-curve
  *   P(candidate) = 1 − (1 − p(s)^r)^B.
  * Unrelated pairs sit near s≈0 ⇒ p≈1/2 ⇒ per-band collision 2^−r: r is the
  * pruning knob (each extra bit halves background candidates), B is the
  * recall knob. r must be ≥~16 for the background rate to stay negligible at
  * web scale (2^−16·B ≈ 10^−4 of the corpus per query); recall is then
  * bought back with more bands and/or multi-probe, NOT fewer bits — fewer
  * bits is quadratic death (see round-1 verdict: 2-bit bands ⇒ 0.9·N²
  * candidate pairs).
  *
  * Multi-probe: probing each band's r single-bit-flip buckets too (Hamming≤1)
  * lifts the per-band hit rate from p^r to p^r + r·p^(r−1)(1−p) at (r+1)×
  * the lookup volume — lookups are rows in a narrow join, far cheaper than
  * more bands, which re-shuffle the corpus keys.
  *
  * `bandGeometry` solves the S-curve for (r, B) given a similarity
  * threshold and target recall, preferring the largest r that stays within
  * the band budget. Note the low-threshold regime is honest but hopeless:
  * at s≈0.35, p≈0.61 and no geometry prunes well — hyperplane LSH only
  * separates what the angle separates. The driver queries over the random
  * test embeddings (neighbors at s≈0.4) therefore pass explicit permissive
  * geometry; real corpora keep the defaults.
  *
  * Dot products and signatures run through the HashKernels JIT-compiled
  * scalar kernels in double precision (Spark's higher-order array functions
  * evaluate interpreted — measurably slower on the hot path; the Column
  * forms below remain for composability).
  */
object Similarity {

  /** Σ a[i]*b[i] in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** P(one hyperplane bit agrees) for a pair at cosine similarity s. */
  def bitAgreeProb(s: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, s))) / math.Pi

  /** 1 − (1 − p(s)^r)^B — probability a pair at cosine s becomes a
    * candidate under (r bits/band, B bands), exact buckets only.
    */
  def candidateProb(s: Double, bitsPerBand: Int, bands: Int): Double =
    1.0 - math.pow(1.0 - math.pow(bitAgreeProb(s), bitsPerBand), bands)

  /** Solve the S-curve for (bitsPerBand, bands): the largest r (≤
    * maxBitsPerBand, most pruning) whose band count for `targetRecall` at
    * cosine `threshold` fits in `maxBands`. Falls back to (1, maxBands)
    * when even 1-bit bands can't reach the target — the caller is asking
    * for recall on pairs the angle barely separates.
    */
  def bandGeometry(
      threshold: Double,
      targetRecall: Double = 0.95,
      maxBands: Int = 32,
      maxBitsPerBand: Int = 20): (Int, Int) = {
    val p = bitAgreeProb(threshold)
    var r = maxBitsPerBand
    while (r >= 1) {
      val pBand = math.pow(p, r)
      if (pBand >= 1.0) return (r, 1)
      val b = math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - pBand)).toInt
      if (b <= maxBands) return (r, math.max(b, 1))
      r -= 1
    }
    (1, maxBands)
  }

  /** Cosine from a precomputed-norm pair: dot/(na*nb). Precomputing norms
    * once per vector (instead of per pair) cuts the per-pair flops 3×. The
    * dot is the native codegen expression (plans.DotProductFloat) — it
    * reads ArrayData in place, where the UDF form copies both arrays per
    * scored pair.
    */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, call_function("dot_f", a, b) / (na * nb)).otherwise(lit(0.0))

  /** Native one-pass cosine (plans.CosineSimFloat); bit-identical to the
    * UDF form, zero per-pair array copies.
    */
  private def cosNative(a: Column, b: Column): Column = call_function("cosine_f", a, b)

  private def ensureNative(df: DataFrame): Unit =
    graft.plans.GraftExtensions.register(df.sparkSession)

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param corpus  (idCol, vecCol) — the full corpus
    * @param queries (idCol, vecCol) — SMALL (broadcast) query set
    * Output: (query_id, neighbor_id, sim DOUBLE rounded to 6, rank INT);
    * self-matches excluded; rank ties broken by neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    ensureNative(corpus)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      HashKernels.normUdf(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      HashKernels.normUdf(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosinePre(col("qv"), col("cv"), col("qn"), col("cn")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** Hard-negative mining for contrastive training: each query's top-k
    * most-similar corpus vectors carrying a DIFFERENT label (the
    * "hardest" negatives — near the query in embedding space but of
    * another class; random negatives are too easy to teach a margin).
    * Brute-force scoring with the label inequality fused into the scan
    * filter, selection through the bounded-heap aggregate — same scale
    * shape as [[bruteForceTopK]]; for corpus-scale mining compose the
    * LSH/IVF candidate generators with the same label filter instead.
    * Output: (query_id, neighbor_id, sim, rank).
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 10): DataFrame = {
    ensureNative(corpus)
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), col(vecCol).as("qv"),
      HashKernels.normUdf(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("c_label"), col(vecCol).as("cv"),
      HashKernels.normUdf(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("c_label"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosinePre(col("qv"), col("cv"), col("qn"), col("cn")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** (band, bucket, <id>) banding frame: exact buckets only. */
  private def bandedExact(
      df: DataFrame, idCol: String, outId: String, vecCol: String,
      bitsPerBand: Int, bands: Int, seed: Int): DataFrame =
    df.select(col(idCol).as(outId),
      posexplode(HashKernels.bandBucketsUdf(bands, bitsPerBand, seed)(col(vecCol))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  /** Candidate (query_id, neighbor_id) pairs from banded bucket matching.
    * Corpus side carries exact buckets only (bands entries per vector, ids
    * only — narrow rows); the query side optionally multi-probes each band's
    * Hamming≤1 neighborhood. Exposed so tests can assert candidate volume.
    */
  def lshCandidates(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      bitsPerBand: Int,
      bands: Int,
      multiProbe: Boolean,
      seed: Int = 42): DataFrame = {
    ensureNative(corpus)
    val c = bandedExact(corpus, idCol, "neighbor_id", vecCol, bitsPerBand, bands, seed)
    val q =
      if (multiProbe)
        queries.select(col(idCol).as("query_id"),
          posexplode(HashKernels.bandBucketsProbedUdf(bands, bitsPerBand, seed)(col(vecCol))))
          .select(col("query_id"),
            (col("pos") / (bitsPerBand + 1)).cast("int").as("band"),
            col("col").as("bucket"))
      else bandedExact(queries, idCol, "query_id", vecCol, bitsPerBand, bands, seed)
    c.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** LSH-bucketed approximate top-k.
    *
    * Default geometry r=16, B=16, multi-probe on: for neighbors at s≥0.8
    * (typical real-corpus near-neighbor), per-band hit ≈ p^16 + 16·p^15(1−p)
    * ≈ 0.13 ⇒ recall ≈ 1−0.87^16 ≈ 0.89; background pairs (s≈0, p=1/2) cost
    * 17·2^−16 per band ⇒ ~0.4% of the corpus scanned per query — a ~60×
    * prune over the round-1 4-bit bands, with higher recall.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      bitsPerBand: Int = 16,
      bands: Int = 16,
      multiProbe: Boolean = true,
      seed: Int = 42): DataFrame = {
    ensureNative(corpus)
    val scored = lshCandidates(corpus, queries, idCol, vecCol, bitsPerBand, bands, multiProbe, seed)
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosNative(col("qv"), col("cv")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** Spherical-k-means centroids trained driver-side on a bounded,
    * deterministic sample (hash-ordered `sampleN` rows — fixed cost no
    * matter the corpus size; centroid *training* on a sample is standard
    * IVF practice, only *assignment* must see every row). Assignment is by
    * cosine, update is the renormalized mean; empty cells keep their
    * previous centroid. Returns (cell LONG, cent_vec ARRAY<FLOAT>).
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lloydIters: Int,
      sampleN: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    val sample: Array[Array[Float]] = corpus
      .select(col(vecCol), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
      .filter(v => HashKernels.dotD(v, v) > 0)
    require(sample.nonEmpty, "trainCentroids: empty corpus")
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(HashKernels.dotD(v, v))
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val unit = sample.map(normalize)
    // k-means++ seeding (deterministic: hash-ordered sample + fixed-seed
    // RNG): next centroid drawn ∝ D², D = spherical distance to the
    // nearest chosen centroid. Spreads centroids so clustered samples
    // don't waste cells — first-k-rows init put multiple centroids inside
    // one dense cluster and left other regions unprobed.
    var cents: Array[Array[Float]] = {
      val rnd = new scala.util.Random(42)
      val picked = scala.collection.mutable.ArrayBuffer(unit(0))
      val minD = unit.map(v => math.max(0.0, 1.0 - HashKernels.dotD(v, unit(0))))
      while (picked.length < math.min(k, unit.length) && minD.exists(_ > 0)) {
        val w = minD.map(d => d * d)
        var target = rnd.nextDouble() * w.sum
        var i = 0
        while (i < w.length - 1 && target >= w(i)) { target -= w(i); i += 1 }
        // float summation can overshoot past the last positive weight and
        // land on a zero-weight (already-chosen) point — redirect to the
        // farthest point instead of wasting a centroid on a duplicate
        if (w(i) == 0.0) i = minD.indices.maxBy(minD)
        picked += unit(i)
        var j = 0
        while (j < unit.length) {
          val d = math.max(0.0, 1.0 - HashKernels.dotD(unit(j), unit(i)))
          if (d < minD(j)) minD(j) = d
          j += 1
        }
      }
      picked.toArray
    }
    var it = 0
    while (it < lloydIters) {
      val dim = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      unit.foreach { v =>
        var best = 0; var bestD = Double.NegativeInfinity; var c = 0
        while (c < cents.length) {
          val d = HashKernels.dotD(v, cents(c))
          if (d > bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else normalize(sums(c).map(_.toFloat))
      }.toArray
      it += 1
    }
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("cell", "cent_vec")
  }

  /** IVF approximate top-k: spherical-k-means cells (trained on a bounded
    * sample, `lloydIters` Lloyd rounds), corpus assigned to its nearest
    * cell once, queries probe the nProbe nearest cells. The candidate
    * shuffle carries bare ids; vectors re-join after the pair dedup.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      kCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 3,
      centroids: Option[DataFrame] = None): DataFrame = {
    ensureNative(corpus)
    val cent = centroids.getOrElse(
      trainCentroids(corpus, idCol, vecCol, kCentroids, lloydIters))

    def cellScores(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), col(vecCol).as("v"))
        .crossJoin(broadcast(cent))
        .select(col(id), col("cell"), cosNative(col("v"), col("cent_vec")).as("csim"))

    // Corpus→cell is an argmax, not a ranking: max_by with a (csim, −cell)
    // order key computes it with map-side combine — same result as the
    // old per-id window (ties → smallest cell), none of its N·k-row sort.
    val c = cellScores(corpus, "neighbor_id")
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"))
    // Query side keeps nProbe cells — the same bounded top-k aggregate the
    // selection step uses.
    val q = TopKAggregator.topKByGroup(
      cellScores(queries, "query_id"), "query_id", "cell", "csim", nProbe,
      outId = "cell")
      .select("query_id", "cell")
    // dedup on bare ids, then re-join vectors (narrow candidate shuffle)
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosNative(col("qv"), col("cv")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  // ---- persisted IVF index -------------------------------------------

  /** Handle to an IVF index persisted on disk ([[ivfWriteIndex]]):
    * `centroids/` (k rows, broadcast at probe time) + `assign/`
    * partitioned by `cell` (each corpus vector stored once, in its
    * nearest cell's partition) + a meta marker written LAST as the
    * commit. A probe plans at most nProbe×queries — bounded by
    * kCentroids — cell partitions; everything else on disk is never
    * opened. This is the train-once / probe-forever ANN shape: the
    * centroid model is the KenLM-file analog, the cell layout is the
    * storage-side partition pruning the in-memory [[ivfTopK]] cannot
    * have.
    */
  final case class PersistedIvfIndex(path: String, kCentroids: Int)

  private def ivfMetaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_ivf_meta.txt")

  private def fsOf(df: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sessionState.newHadoopConf())

  private def writeIvfMeta(spark: SparkSession, path: String, k: Int): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      path, s"._meta-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(s"graft-ivf-v1\nkCentroids=$k\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val meta = ivfMetaPath(path)
    if (fs.exists(meta)) fs.delete(meta, false)
    if (!fs.rename(tmp, meta))
      throw new java.io.IOException(s"ivf meta commit failed under $path")
  }

  /** Open a persisted IVF index (meta must exist — the commit marker). */
  def ivfOpenIndex(spark: SparkSession, path: String): PersistedIvfIndex = {
    val fs = fsOf(spark, path)
    val p = ivfMetaPath(path)
    require(fs.exists(p),
      s"no IVF index under $path — build one with Similarity.ivfWriteIndex")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = txt.split("\n")
    require(lines.headOption.contains("graft-ivf-v1"),
      s"unrecognized IVF meta format in $p")
    val k = lines.find(_.startsWith("kCentroids=")).map(_.drop(11).toInt)
      .getOrElse(throw new IllegalArgumentException(s"no kCentroids in $p"))
    PersistedIvfIndex(path, k)
  }

  /** Each row's nearest cell, VECTOR KEPT (the stored index row). Same
    * deterministic argmax as [[ivfTopK]]'s corpus side: max_by with a
    * (csim, −cell) order key, ties to the smallest cell.
    */
  private def assignCells(df: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("vec"), col("cell"),
        cosNative(col("vec"), col("cent_vec")).as("csim"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("vec").as("vec"), col("cell").as("cell")),
        struct(col("csim"), -col("cell"))).as("w"))
      .select(col("id"), col("w.vec").as("vec"), col("w.cell").as("cell"))

  /** Build (or rebuild) the persisted index: train centroids on
    * `corpus` — or reuse `centroids` when given, the re-shard /
    * append==rebuild path — assign every vector to its cell once, write
    * `assign/` partitioned by cell, commit the meta marker last. A
    * crash before the marker leaves no readable index.
    */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, kCentroids: Int = 16, lloydIters: Int = 3,
      centroids: Option[DataFrame] = None): PersistedIvfIndex = {
    ensureNative(corpus)
    val spark = corpus.sparkSession
    val fs = fsOf(spark, path)
    val meta = ivfMetaPath(path)
    if (fs.exists(meta)) fs.delete(meta, false) // invalidate before rewrite
    val cent = centroids.getOrElse(
      trainCentroids(corpus, idCol, vecCol, kCentroids, lloydIters))
    cent.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val centBack = spark.read.parquet(s"$path/centroids")
    assignCells(corpus, idCol, vecCol, centBack)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assign")
    writeIvfMeta(spark, path, kCentroids)
    PersistedIvfIndex(path, kCentroids)
  }

  /** Append `newRows` to the index: assign against the EXISTING
    * centroids (the model is fixed — that is what makes the append
    * write into only its own cells' partitions) and parquet-append.
    * Identical to a full rebuild with the same centroids, which
    * DedupSpec-style tests pin.
    */
  def ivfExtendIndex(newRows: DataFrame, idCol: String, vecCol: String,
      index: PersistedIvfIndex): Unit = {
    ensureNative(newRows)
    val spark = newRows.sparkSession
    ivfOpenIndex(spark, index.path): Unit // refuse an uncommitted index
    val cent = spark.read.parquet(s"${index.path}/centroids")
    assignCells(newRows, idCol, vecCol, cent)
      .write.mode("append").partitionBy("cell").parquet(s"${index.path}/assign")
  }

  /** Approximate top-k THROUGH the persisted index: queries pick their
    * nProbe nearest cells against the broadcast centroid table, the
    * probed cells' partitions — a bounded, ≤ kCentroids planning list —
    * are the only data read, and the exact re-rank runs inside them.
    * Same scoring/tie-break discipline as [[ivfTopK]]; output
    * (query_id, neighbor_id, sim, rank).
    */
  def ivfProbePersisted(spark: SparkSession, index: PersistedIvfIndex,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    ensureNative(queries)
    ivfOpenIndex(spark, index.path): Unit
    val cent = spark.read.parquet(s"${index.path}/centroids")
    val qcells = TopKAggregator.topKByGroup(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .crossJoin(broadcast(cent))
        .select(col("query_id"), col("cell"),
          cosNative(col("qv"), col("cent_vec")).as("csim")),
      "query_id", "cell", "csim", nProbe, outId = "cell")
      .select("query_id", "cell")
    // the probed-cell list is bounded by kCentroids — planning state
    val cells = qcells.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val assign = spark.read.parquet(s"${index.path}/assign")
      .withColumn("cell", col("cell").cast("long"))
      .filter(col("cell").isin(cells: _*))
    val scored = assign.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosNative(col("qv"), col("vec")), 6).as("sim"))
    TopKAggregator.topKByGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** Candidate (id_a, id_b) pairs for the self-join near-dup path: both
    * sides exact buckets (multi-probe would break the a<b symmetry).
    * Exposed so tests can assert candidate volume ≪ N²/2.
    */
  def cosineCandidates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bitsPerBand: Int,
      bands: Int,
      seed: Int = 42): DataFrame = {
    val sig = bandedExact(df, idCol, "id", vecCol, bitsPerBand, bands, seed)
    sig.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(sig.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (the
    * embedding-space member of the dedup family). Output:
    * (id_a, id_b, sim), id_a < id_b, sim >= threshold.
    *
    * Geometry defaults to `bandGeometry(threshold, targetRecall)` — at the
    * default threshold 0.95 that solves to 20-bit bands (background
    * collision 2^−20/band), so candidate volume stays ~10^−5·N²/2 while
    * recall at the threshold boundary is ≥ targetRecall. Pass explicit
    * (bitsPerBand, bands) to override — required for low thresholds on
    * weakly-separated corpora, where the S-curve honestly cannot prune
    * (see the object scaladoc).
    */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      bitsPerBand: Int = -1,
      bands: Int = -1,
      targetRecall: Double = 0.95,
      seed: Int = 42): DataFrame = {
    ensureNative(df)
    val (r, b) =
      if (bitsPerBand > 0 && bands > 0) (bitsPerBand, bands)
      else bandGeometry(threshold, targetRecall)
    // both verify-join sides read this map-only frame; repartition(id)
    // materializes it once as a reusable disk-backed exchange (same
    // ReuseExchange rationale as Dedup.minhashNearDuplicates) and lands
    // the joins co-partitioned
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      HashKernels.normUdf(col(vecCol)).as("nrm"))
      .repartition(col("id"))
    cosineCandidates(df, idCol, vecCol, r, b, seed)
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosinePre(col("va"), col("vb"), col("na"), col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
