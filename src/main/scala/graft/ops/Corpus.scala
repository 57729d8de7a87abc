package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pipeline a training-data run actually
  * executes — the Gopher order (Rae et al. 2112.11446 §A1.2): rule-based
  * quality filtering, then repetition filtering, then near-duplicate
  * removal among the survivors. Composition keeps each stage's operator
  * contract — both filter stages are map-only and happen FIRST so the
  * quadratic-ish dedup stage only sees documents worth keeping.
  */
object Corpus {

  /** Gopher-filter `df`, drop documents failing the Table-A1 repetition
    * thresholds ([[TextAnalysis.repetitionFilter]]), then drop MinHash
    * near-duplicates among the survivors. Returns the surviving rows with
    * their original columns. `cleanStats` reports what each stage
    * dropped. `repetitionRules = false` restores the two-stage pipeline.
    */
  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      k: Int = 5,
      numHashes: Int = 40,
      bands: Int = 8,
      threshold: Double = 0.8,
      repetitionRules: Boolean = true): DataFrame = {
    val cols = df.columns.toIndexedSeq.map(col)
    val quality = TextAnalysis.gopherFilter(df, textCol, minWords = minWords)
      .filter(col("keep"))
      .select(cols: _*)
    val kept =
      if (!repetitionRules) quality
      else TextAnalysis.repetitionFilter(quality, textCol)
        .filter(col("keep"))
        .select(cols: _*)
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
      threshold: Double = 0.8,
      repetitionRules: Boolean = true): DataFrame = {
    val cols = df.columns.toIndexedSeq.map(col)
    // cache each filter stage: multiple downstream actions (reason
    // counts, kept count, next stage) would otherwise re-run the
    // per-document kernels over the full corpus per action
    val flagged = TextAnalysis.gopherFilter(df, textCol, minWords = minWords).cache()
    val repFlagged =
      if (repetitionRules)
        Some(TextAnalysis.repetitionFilter(
          flagged.filter(col("keep")).select(cols: _*), textCol).cache())
      else None
    try {
      def reasons(f: DataFrame): Seq[(String, Long)] = f.filter(!col("keep"))
        .groupBy(col("drop_reason")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val reasonCounts = reasons(flagged) ++ repFlagged.toSeq.flatMap(reasons)
      val kept = repFlagged.getOrElse(flagged)
        .filter(col("keep")).select(cols: _*)
      val nKept = kept.count()
      val nSurvive = Dedup.dropNearDuplicates(kept, idCol, textCol,
        k = k, numHashes = numHashes, bands = bands, threshold = threshold).count()
      val spark = df.sparkSession
      import spark.implicits._
      (reasonCounts ++ Seq(
        ("near_duplicate", nKept - nSurvive),
        ("kept", nSurvive))).toDF("stage", "n")
    } finally {
      flagged.unpersist()
      repFlagged.foreach(_.unpersist())
    }
  }
}
