package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributional corpus statistics: how far each slice's token
  * distribution sits from the corpus-wide one. The KL number is the
  * standard "domain drift" diagnostic of a training-data pipeline —
  * which sources are stylistic outliers, which shard of a crawl dump
  * changed under you, which language's token mix the mixture re-weighting
  * actually shifted.
  *
  * KL(p_g || q) = Σ_t p_g(t) · ln(p_g(t) / q(t)) with p_g the group's
  * distribution and q the global one. Every token of the group occurs in
  * the global distribution, so no term needs smoothing and the sum is
  * finite and ≥ 0.
  *
  * Scale shape: one (group, token) count aggregate (vocab-bounded,
  * map-side combined), two roll-ups of that frame (per-group and global
  * totals, both tiny), one join back, one quantized-sum aggregate. The
  * per-term log terms quantize to 1e-9 Longs before summing (the
  * [[Classifier]] / [[LanguageModel]] pattern), so the per-group sum is
  * exact integer addition — order-insensitive, partition-invariant, and
  * replayable by the DuckDB oracle as a DECIMAL(38,9) sum.
  */
object CorpusStats {

  /** (groupCol, n_tokens, n_types, round(kl, 6)) per group — KL divergence
    * of the group's token distribution from the whole-corpus distribution,
    * [[TextAnalysis.tokens]] tokenization (codegen'd, no UDF on the
    * explode path).
    */
  def klBySource(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val occ = docs.select(col(groupCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val tf = occ.groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val perGroup = tf.groupBy(col(groupCol)).agg(sum(col("c")).as("n_g"))
    val global = tf.groupBy(col("token")).agg(sum(col("c")).as("c_t"))
    val total = tf.agg(sum(col("c")).as("n"))
    val pg = col("c").cast("double") / col("n_g")
    val q = col("c_t").cast("double") / col("n")
    val term = pg * log(pg / q)
    tf.join(perGroup, Seq(groupCol))
      .join(global, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(groupCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        round((sum(floor(term * 1e9 + 0.5).cast("long")) / 1e9), 6).as("kl"))
  }

  /** The DuckDB oracle for [[klBySource]] — self-contained, any scale. */
  def klOracleSql(table: String, groupCol: String, textCol: String): String =
    s"""WITH occ AS (
       |  SELECT $groupCol,
       |    unnest(regexp_extract_all(lower(trim($textCol)), '\\S+')) AS token
       |  FROM $table),
       |tf AS (SELECT $groupCol, token, count(*) AS c FROM occ GROUP BY 1, 2),
       |g AS (SELECT $groupCol, sum(c) AS n_g FROM tf GROUP BY 1),
       |gl AS (SELECT token, sum(c) AS c_t FROM tf GROUP BY 1),
       |tot AS (SELECT sum(c) AS n FROM tf),
       |terms AS (
       |  SELECT tf.$groupCol, tf.c,
       |    (CAST(tf.c AS DOUBLE) / n_g) *
       |      ln((CAST(tf.c AS DOUBLE) / n_g) / (CAST(c_t AS DOUBLE) / n)) AS term
       |  FROM tf JOIN g USING ($groupCol) JOIN gl USING (token) CROSS JOIN tot)
       |SELECT $groupCol, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
       |  round(CAST(sum(CAST(round(term, 9) AS DECIMAL(38,9))) AS DOUBLE), 6) AS kl
       |FROM terms GROUP BY $groupCol ORDER BY $groupCol""".stripMargin
}
