package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pipeline a training-data run actually
  * executes: rule-based document filtering (Gopher rules), then
  * near-duplicate removal among the survivors. Composition keeps each
  * stage's operator contract — filtering is map-only and happens FIRST so
  * the quadratic-ish dedup stage only sees documents worth keeping.
  */
object Corpus {

  /** Gopher-filter `df`, then drop MinHash near-duplicates among the
    * survivors. Returns the surviving rows with their original columns.
    * `stats` (companion method) reports what each stage dropped.
    */
  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      k: Int = 5,
      numHashes: Int = 40,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val kept = TextAnalysis.gopherFilter(df, textCol, minWords = minWords)
      .filter(col("keep"))
      .select(df.columns.toIndexedSeq.map(col): _*)
    Dedup.dropNearDuplicates(kept, idCol, textCol,
      k = k, numHashes = numHashes, bands = bands, threshold = threshold)
  }

  /** Per-stage drop accounting: one row per drop_reason (including
    * "near_duplicate" and "kept"), with counts. One pass of the filter
    * stage + the dedup survivors' count.
    */
  def cleanStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      k: Int = 5,
      numHashes: Int = 40,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    // cache the filter stage: three downstream actions (reason counts,
    // kept count, dedup-survivor count) would otherwise re-run the
    // per-document kernel three times over the full corpus
    val flagged = TextAnalysis.gopherFilter(df, textCol, minWords = minWords).cache()
    try {
      val reasonCounts: Seq[(String, Long)] = flagged.filter(!col("keep"))
        .groupBy(col("drop_reason")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val kept = flagged.filter(col("keep")).select(df.columns.toIndexedSeq.map(col): _*)
      val nKept = kept.count()
      val nSurvive = Dedup.dropNearDuplicates(kept, idCol, textCol,
        k = k, numHashes = numHashes, bands = bands, threshold = threshold).count()
      val spark = df.sparkSession
      import spark.implicits._
      (reasonCounts ++ Seq(
        ("near_duplicate", nKept - nSurvive),
        ("kept", nSurvive))).toDF("stage", "n")
    } finally flagged.unpersist()
  }
}
