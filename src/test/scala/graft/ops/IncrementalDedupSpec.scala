package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the incremental MinHash path ([[Dedup.minhashBuildIndex]] /
  * [[Dedup.minhashProbe]] / [[Dedup.minhashIncrementalFilter]]): planted
  * cross-batch near-duplicates are recovered, novel documents survive
  * the ingest filter, probing never pairs new docs with each other, the
  * probe agrees with the batch operator's verdicts, and results are
  * partition-count invariant.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 40-word documents with a shared template; docs i and 1000+i are
  // near-identical (one word changed → shingle Jaccard ≈ 0.9).
  private def mkText(i: Long, tweak: Boolean): String = {
    val base = (0 until 40).map(w => s"w${(i * 7 + w * 3) % 23}tok$w").toArray
    if (tweak) base(20) = "CHANGED"
    base.mkString(" ")
  }

  // genuinely novel docs draw from a disjoint token alphabet (mkText only
  // has 23 distinct variants — reusing it with shifted ids would alias a
  // corpus doc)
  private def novelText(i: Long): String =
    (0 until 40).map(w => s"novel${i}x$w fresh${(i * 13 + w) % 97}").mkString(" ")

  private val corpus = (1L to 20L).map(i => (i, mkText(i, tweak = false)))
  private val newBatch =
    (1L to 6L).map(i => (1000L + i, mkText(i, tweak = true))) ++ // near-dups of 1..6
      (7L to 12L).map(i => (2000L + i, novelText(i))) // novel

  test("probe recovers every planted cross-batch near-duplicate, nothing else") {
    val idx = Dedup.minhashBuildIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, numHashes = 40, bands = 20)
    val pairs = Dedup.minhashProbe(newBatch.toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = (1L to 6L).map(i => (1000L + i, i)).toSet
    assert(pairs.toSet == planted)
  }

  test("incremental filter keeps exactly the novel documents") {
    val idx = Dedup.minhashBuildIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, numHashes = 40, bands = 20)
    val kept = Dedup.minhashIncrementalFilter(newBatch.toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (7L to 12L).map(2000L + _).toSet)
  }

  test("probe verdicts agree with the batch operator on the union corpus") {
    val idx = Dedup.minhashBuildIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, numHashes = 40, bands = 20)
    val probed = Dedup.minhashProbe(newBatch.toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.7)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    val batch = Dedup.minhashNearDuplicates(
      (corpus ++ newBatch).toDF("doc_id", "text"),
      "doc_id", "text", k = 5, numHashes = 40, bands = 20, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // keep only cross-batch pairs (old id < 1000 <= new id)
      .filter { case (a, b, _) => a <= 20L && b > 1000L }
      .toSet
    assert(probed == batch)
  }

  test("probe result is partition-count invariant") {
    val idx1 = Dedup.minhashBuildIndex(
      corpus.toDF("doc_id", "text").repartition(1), "doc_id", "text",
      k = 5, numHashes = 40, bands = 20)
    val idx7 = Dedup.minhashBuildIndex(
      corpus.toDF("doc_id", "text").repartition(7), "doc_id", "text",
      k = 5, numHashes = 40, bands = 20)
    val a = Dedup.minhashProbe(newBatch.toDF("doc_id", "text").repartition(1),
      "doc_id", "text", idx1, threshold = 0.7)
      .orderBy("id_new", "id_old").collect()
    val b = Dedup.minhashProbe(newBatch.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", idx7, threshold = 0.7)
      .orderBy("id_new", "id_old").collect()
    assert(a === b)
  }
}
