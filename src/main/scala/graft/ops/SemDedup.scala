package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the embeddings,
  * compare pairs only WITHIN a cluster, and drop all but one of any group
  * whose cosine similarity exceeds the threshold. Catches paraphrases and
  * re-encodings that n-gram dedup (MinHash/SimHash) cannot see.
  *
  * Scale shape mirrors the paper's reason for clustering at all: all-pairs
  * cosine is O(N²) and dead at corpus scale, but within-cluster pairs are
  * O(N²/k) spread over k independent cells. Here each cell additionally
  * grid-splits when it exceeds `maxCellRows` (the exact g(g+1)/2 cell
  * cover [[Dedup.ngramJaccard]] uses), so one mega-cluster — the skew case
  * — becomes ~g²/2 bounded tasks instead of one quadratic straggler.
  * Candidates carry bare (id, vector) pairs; centroids ride a broadcast.
  *
  * Like SemDeDup itself this is approximate ACROSS clusters: a pair split
  * by the k-means boundary is not compared. Within-cluster results are
  * exact, deterministic (seeded k-means++ on a hash-ordered sample), and
  * pinned by planted-duplicate tests; the driver records a rows-only
  * check (cluster geometry is not SQL-expressible).
  */
object SemDedup {

  /** (id_a, id_b, sim) for same-cluster pairs with cosine ≥ `threshold`,
    * id_a < id_b. `kCentroids` trades recall (fewer, bigger cells compare
    * more pairs) against cost; `maxCellRows` bounds any one task's
    * quadratic work regardless of how skewed the cluster sizes come out.
    */
  def semanticPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      kCentroids: Int = 64,
      lloydIters: Int = 3,
      maxCellRows: Int = 100000,
      centroids: Option[DataFrame] = None): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    require(maxCellRows > 0, "maxCellRows must be positive")
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    // pre-trained centroids welcome (the ivfTopK convention): training
    // is deterministic, so this only saves the recompute for callers
    // that already hold the model (e.g. to stash it for the oracle)
    val cent = centroids.getOrElse(
      Similarity.trainCentroids(corpus, idCol, vecCol, kCentroids, lloydIters))

    // nearest-cell assignment: argmax via max_by with map-side combine
    // (same shape as ivfTopK's assignment — never a per-id window)
    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("v"), col("cell"),
        call_function("cosine_f", col("v"), col("cent_vec")).as("csim"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cell"), col("v")), struct(col("csim"), -col("cell"))).as("m"))
      .select(col("id"), col("m.cell").as("cell"), col("m.v").as("v"))

    // grid-split oversized cells: row with sub-bucket s probes every cell
    // (min(s,t), max(s,t)) so each intra-cluster pair meets in EXACTLY one
    // task — the quadratic hot-cluster work spreads over ~g²/2 tasks
    val sizes = assigned.groupBy(col("cell"))
      .agg(ceil(count(lit(1)).cast("double") / maxCellRows).cast("int").as("g"))
    val gridded = assigned.join(sizes, Seq("cell"))
      .withColumn("sub", pmod(xxhash64(col("id")), col("g")).cast("int"))
      .withColumn("t", explode(sequence(lit(0), col("g") - 1)))
      .withColumn("lo", least(col("sub"), col("t")))
      .withColumn("hi", greatest(col("sub"), col("t")))
    val a = gridded.select(col("cell"), col("lo"), col("hi"),
      col("sub").as("sub_a"), col("id").as("id_a"), col("v").as("v_a"))
    val b = gridded.select(col("cell"), col("lo"), col("hi"),
      col("sub").as("sub_b"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cell", "lo", "hi"))
      .filter(col("id_a") < col("id_b") &&
        // equal sub-buckets co-occur in every probe cell of the row:
        // count them only once, in their diagonal cell
        (col("sub_a") =!= col("sub_b") ||
          (col("lo") === col("sub_a") && col("hi") === col("sub_a"))))
      .select(col("id_a"), col("id_b"),
        round(call_function("cosine_f", col("v_a"), col("v_b")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** The corpus with semantic duplicates removed: [[semanticPairs]] →
    * connected components → keep the min-id representative of each
    * near-duplicate group (deterministic; the paper keeps a random
    * member — any fixed rule preserves its semantics).
    */
  def dropSemanticDuplicates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      kCentroids: Int = 64,
      lloydIters: Int = 3,
      maxCellRows: Int = 100000,
      centroids: Option[DataFrame] = None): DataFrame = {
    val pairs = semanticPairs(corpus, idCol, vecCol, threshold,
      kCentroids, lloydIters, maxCellRows, centroids)
    val comps = Dedup.connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("component")).select(col("id"))
    corpus.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
