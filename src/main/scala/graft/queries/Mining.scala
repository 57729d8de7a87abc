package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Classifier, Sampling, Sketches}

/** Corpus-mining queries: sketch-based heavy hitters, temperature-scaled
  * mixture sampling, and the gradient-trained quality classifier.
  */
object Mining {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact heavy hitters (> 1/40 of all token occurrences) via the
    // two-pass Misra-Gries scheme: bounded-sketch candidates, then an
    // exact recount of only those tokens. The oracle recounts the whole
    // vocabulary — same answer, quadratically more shuffle.
    "q_heavy_hitters" -> ((s, dir) =>
      Sketches.heavyHitters(Tables(s, dir, "documents"), "doc_id", "text", 40)),

    // Temperature-scaled (τ=0.5) allocation of a 200-doc budget across
    // languages — sqrt weights are bit-identical cross-engine, the split
    // is floor(budget·w/Σw) in correctly-rounded double ops.
    "q_temperature_alloc" -> ((s, dir) =>
      Sampling.temperatureAllocation(Tables(s, dir, "documents"), "lang", 200L)
        .orderBy(col("lang"))),

    // The drawn sample: first target_lang docs per language in md5 order.
    "q_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureSample(Tables(s, dir, "documents"), "lang", "doc_id", 200L)
        .select(col("lang"), col("doc_id"), col("sample_rank"), col("target"))
        .orderBy(col("lang"), col("sample_rank"))),

    // Logistic-regression quality classifier (hashed bag-of-words,
    // quantized-Long gradient sums). The synthetic corpus has no
    // lang/text correlation to learn, so the demo target is a lexical
    // property — "mentions spark" — that the model must recover through
    // the hashed feature space. Iterative training is not
    // SQL-expressible -> rows-only; ClassifierSpec pins the arithmetic
    // against a driver-side reference and partition invariance.
    "q_lr_quality" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("y", col("text").contains("spark").cast("int"))
      val model = Classifier.trainLogistic(docs, "y", "text", dim = 256, iters = 60)
      Classifier.scoreLogistic(docs, "doc_id", "text", model)
        .orderBy(col("doc_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH occ AS (
        |  SELECT unnest(regexp_extract_all(lower(trim(text)), '\S+')) AS token
        |  FROM documents),
        |tot AS (SELECT count(*) AS w FROM occ),
        |c AS (SELECT token, count(*) AS cnt FROM occ GROUP BY token)
        |SELECT token, cnt, ROUND((cnt * 1.0) / w, 6) AS share
        |FROM c, tot WHERE cnt * 40 > w
        |ORDER BY cnt DESC, token""".stripMargin,
    "q_temperature_alloc" ->
      """WITH g AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT) AS w_quant
        |  FROM g),
        |t AS (SELECT sum(w_quant) AS tot FROM w)
        |SELECT lang, n_docs, w_quant,
        |  CAST(floor(CAST(200 AS DOUBLE) * w_quant / tot) AS BIGINT) AS target
        |FROM w, t ORDER BY lang""".stripMargin,
    "q_temperature_mix" ->
      """WITH g AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT) AS w_quant
        |  FROM g),
        |t AS (SELECT sum(w_quant) AS tot FROM w),
        |alloc AS (SELECT lang,
        |  CAST(floor(CAST(200 AS DOUBLE) * w_quant / tot) AS BIGINT) AS target
        |  FROM w, t),
        |r AS (SELECT lang, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) || '|' || CAST(doc_id AS VARCHAR))
        |    AS sample_rank
        |  FROM documents)
        |SELECT r.lang, r.doc_id, r.sample_rank, alloc.target
        |FROM r JOIN alloc ON r.lang = alloc.lang
        |WHERE r.sample_rank <= alloc.target
        |ORDER BY r.lang, r.sample_rank""".stripMargin)
}
