package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Three tiers, same output contract (query_id, neighbor_id, sim, rank):
  *  - `bruteForceTopK`: exact; broadcast the (small) query set against the
  *    corpus — map-side cosine + per-query top-k. Correct baseline.
  *  - `lshTopK`: random-hyperplane LSH — corpus is bucketed by sign-bit
  *    signature, candidates come from matching buckets only; the shuffle is
  *    keyed by (band, bucket), never all-pairs. The 100 TB path.
  *  - `ivfTopK`: IVF-style — corpus assigned to nearest of k sampled
  *    centroids once, queries probe the nProbe nearest centroids. Bounded
  *    candidate sets with data-adaptive partitioning.
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

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param corpus  (idCol, vecCol) — the full corpus
    * @param queries (idCol, vecCol) — SMALL (broadcast) query set
    * Output: (query_id, neighbor_id, sim DOUBLE rounded to 6, rank INT);
    * self-matches excluded; rank ties broken by neighbor id.
    */
  /** Cosine from a precomputed-norm pair: dot/(na*nb). Precomputing norms
    * once per vector (instead of per pair) cuts the per-pair flops 3×.
    */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, HashKernels.dotUdf(a, b) / (na * nb)).otherwise(lit(0.0))

  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      HashKernels.normUdf(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      HashKernels.normUdf(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosinePre(col("qv"), col("cv"), col("qn"), col("cn")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane sign-bit signature: `bits` pseudo-random hyperplanes
    * derived deterministically from (seed, bit, dim) via a hash — no
    * driver-side RNG state, reproducible across runs and executors.
    */
  def hyperplaneSignature(vec: Column, bits: Int, seed: Int = 42): Column = {
    val sigBits = (0 until bits).map { b =>
      // pseudo-random ±weights per dimension: hash(seed, bit, i) mapped to
      // a centered double in [-0.5, 0.5)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(lit(seed), lit(b), i), lit(100000L)).cast("double") / 100000.0 - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    sigBits.reduce(_ bitwiseOR _)
  }

  /** LSH-bucketed approximate top-k: signatures are split into `bands`
    * chunks; vectors sharing any chunk value are candidates. Recall rises
    * with bands; cost is bands× duplication of the corpus keys (ids +
    * signature only — vectors travel once via the candidate join).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      bits: Int = 16,
      bands: Int = 4,
      seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1
    // Banded frames carry ids only; vectors re-join after the pair dedup so
    // the candidate shuffle stays narrow (same shape as the dedup family).
    def banded(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
        HashKernels.hyperplaneSigUdf(bits, seed)(col(vecCol)).as("sig"))
        .select(col(id),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = banded(corpus, "neighbor_id")
      .join(broadcast(banded(queries, "query_id")), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(HashKernels.cosineUdf(col("qv"), col("cv")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: kCentroids rows sampled deterministically
    * as centroids (a real deployment would k-means them; sampling keeps the
    * operator self-contained), corpus assigned to its nearest centroid,
    * queries probe the nProbe nearest centroid cells.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      kCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cent = corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .withColumn("h", xxhash64(col("cent_id")))
      .orderBy(col("h")).limit(kCentroids).drop("h")

    def assign(df: DataFrame, id: String, vec: String, keep: Int) = {
      val w = Window.partitionBy(col(id)).orderBy(col("csim").desc, col("cent_id"))
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .crossJoin(broadcast(cent))
        .withColumn("csim", HashKernels.cosineUdf(col(vec), col("cent_vec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col(id), col(vec), col("cent_id").as("cell"))
    }
    val c = assign(corpus, "neighbor_id", "cv", 1)
    val q = assign(queries, "query_id", "qv", nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // dedup on bare ids, then re-join vectors (narrow candidate shuffle)
    c.select("cell", "neighbor_id")
      .join(broadcast(q.select("cell", "query_id")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(HashKernels.cosineUdf(col("qv"), col("cv")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (the
    * embedding-space member of the dedup family). Output:
    * (id_a, id_b, sim), id_a < id_b, sim >= threshold.
    */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      bits: Int = 16,
      bands: Int = 8,
      seed: Int = 42): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    val mask = (1L << rowsPerBand) - 1
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      HashKernels.normUdf(col(vecCol)).as("nrm"))
    // Bucketed frame carries only (band, bucket, id); vectors re-join after
    // the pair-dedup so the candidate shuffle stays narrow.
    val sig = vecs.select(col("id"), HashKernels.hyperplaneSigUdf(bits, seed)(col("v")).as("sig"))
      .select(col("id"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    sig.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(sig.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosinePre(col("va"), col("vb"), col("na"), col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
