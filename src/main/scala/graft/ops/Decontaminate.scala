package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that overlap an
  * evaluation set, the standard pre-training hygiene step (the GPT-3 /
  * PaLM appendices scan for shared word n-grams between each training
  * document and every benchmark example; contaminated documents are
  * dropped or flagged before training).
  *
  * Scale shape: the eval set is tiny next to a 100 TB corpus, so its
  * exploded (bench_id, gram) table is BROADCAST — the corpus side never
  * shuffles. Each document explodes to its distinct n-grams, map-side
  * joins the broadcast benchmark grams, and the per-(doc, bench) overlap
  * count partial-aggregates before the one narrow shuffle of matching
  * pairs (a vanishing fraction of the corpus). No all-pairs work, no
  * corpus-sized shuffle, no window.
  *
  * Everything is exact and deterministic, so the driver oracle
  * hash-checks it end to end (unlike the probabilistic MinHash family).
  */
object Decontaminate {

  /** Distinct word `n`-grams of `text` (whitespace tokens, lowercased —
    * the same normalization as [[TextAnalysis.tokens]], so overlap counts
    * agree with the text-analysis family), in first-occurrence order;
    * shorter-than-n documents have no n-grams. Runs through the compiled
    * [[HashKernels.wordNgrams]] kernel: the equivalent expression chain
    * (`transform(sequence(...), slice + concat_ws)` + `array_distinct`)
    * is interpreted, and profiling at sf0.1 put ~95% of the decontaminate
    * queries' wall-clock into it.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    HashKernels.wordNgramsUdf(n)(text)
  }

  /** (doc_id, bench_id, n_shared) for every corpus document sharing at
    * least `minShared` distinct word n-grams with a benchmark document.
    *
    * `sameIdSpace = true` (the default, matching the common "bench is a
    * subset of the corpus" setup) excludes self-pairs — a document that IS
    * a benchmark row trivially shares everything with itself and says
    * nothing about contamination. Pass `sameIdSpace = false` when the
    * benchmark is a separate table whose ids could coincidentally collide
    * with corpus ids: there a value collision is NOT a self-pair, and
    * filtering it would silently drop a genuine contamination hit.
    *
    * `hashGrams = true` is the recommended setting at 100 TB scale (the
    * code default stays `false` — the string path is the oracle-checked,
    * exactly-auditable one): grams ride the join as FNV-1a int64s of the
    * gram chars, so the exploded corpus frame carries 8-byte keys instead
    * of ~50-byte 8-gram strings (~5× narrower), the broadcast bench table
    * shrinks the same way, and no gram string is ever materialized.
    * 64-bit collisions (P ≈ |grams|²/2^64 — negligible, and gate-checked
    * absent in the testdata by DecontaminateSpec's hashed==string pin)
    * can perturb a pair's count in either direction: a cross-document
    * collision inflates it by one (false flag), while a collision
    * between two distinct grams WITHIN one document dedups them to one
    * key and undercounts by one (potentially a missed hit at exactly
    * minShared). Decontamination errs toward dropping anyway.
    */
  def overlapPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int = 8,
      minShared: Int = 1,
      sameIdSpace: Boolean = true,
      hashGrams: Boolean = false): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    def grams(text: Column): Column =
      if (hashGrams) HashKernels.wordNgramHashesUdf(n)(text)
      else wordNgrams(text, n)
    val benchGrams = bench
      .select(col(benchIdCol).as("bench_id"),
        explode(grams(col(benchTextCol))).as("gram"))
      .distinct()
    val docGrams = docs
      .select(col(idCol).as("__did"),
        explode(grams(col(textCol))).as("gram"))
    // grams are distinct per doc AND per bench row, so count(*) per pair
    // IS the distinct shared-gram count — no count_distinct shuffle state
    val joined = docGrams.join(broadcast(benchGrams), Seq("gram"))
    val paired = if (sameIdSpace) joined.filter(col("__did") =!= col("bench_id")) else joined
    paired
      .groupBy(col("__did"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumnRenamed("__did", idCol)
  }

  /** The corpus minus every document contaminated against `bench` —
    * [[overlapPairs]] distilled to the flagged id set, anti-joined back.
    * The flagged set is small (it's bounded by the benchmark's reach), so
    * the anti-join broadcasts.
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int = 8,
      minShared: Int = 1,
      sameIdSpace: Boolean = true,
      hashGrams: Boolean = false): DataFrame = {
    val flagged = overlapPairs(docs, idCol, textCol,
      bench, benchIdCol, benchTextCol, n, minShared, sameIdSpace, hashGrams)
      .select(col(idCol)).distinct()
    docs.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
