package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Dsir]] importance weighting: hand-computed log-ratios, sign
  * behavior (target-typical positive, raw-only negative), unseen-token
  * fallback, the hashed-bucket variant, and partition invariance. The
  * driver oracle replays the exact path end to end (q_dsir_weights).
  */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    (1L, "wiki article text text"),
    (2L, "wiki cite text")).toDF("doc_id", "text")
  private val raw = Seq(
    (10L, "wiki article text"),
    (11L, "spam pills spam buy"),
    (12L, "text article wiki")).toDF("doc_id", "text")

  test("hand-computed log weight on a tiny corpus") {
    // target counts: wiki 2, article 1, text 3, cite 1 (T=7)
    // raw counts: wiki 2, article 2, text 2, spam 2, pills 1, buy 1 (R=10)
    // union vocab = {wiki, article, text, cite, spam, pills, buy}, V=7
    val out = Dsir.importanceWeights(target, raw, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lw(toks: (Long, Long)*): Double =
      toks.map { case (t, r) =>
        math.log((t + 1.0) / 14.0) - math.log((r + 1.0) / 17.0)
      }.sum
    val expected10 = lw((2L, 2L), (1L, 2L), (3L, 2L)) // wiki article text
    assert(out(0).getLong(0) == 10L)
    assert(math.abs(out(0).getDouble(2) - expected10) < 1e-6)
    // doc 11 is raw-only vocabulary -> strongly negative
    assert(out(1).getDouble(2) < 0)
    // doc 10 and 12 are permutations of the same bag -> identical weight
    assert(out(0).getDouble(2) == out(2).getDouble(2))
    assert(expected10 > 0)
  }

  test("unseen tokens fall back to the smoothing-floor delta") {
    val m = Dsir.trainImportance(target, raw, "doc_id", "text")
    val out = Dsir.scoreImportance(
      Seq((99L, "zzz qqq")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    val expected = 2 * (math.log(1.0 / 14.0) - math.log(1.0 / 17.0))
    assert(math.abs(out.getDouble(2) - expected) < 1e-6)
  }

  test("hashed-bucket variant is deterministic and collision-consistent") {
    val a = Dsir.importanceWeights(target, raw, "doc_id", "text", hashBuckets = 64)
      .orderBy("doc_id").collect()
    val b = Dsir.importanceWeights(target, raw, "doc_id", "text", hashBuckets = 64)
      .orderBy("doc_id").collect()
    assert(a === b)
    // with enough buckets for this 7-token vocab, collisions are unlikely
    // to flip the sign structure: target-typical stays above raw-only
    assert(a(0).getDouble(2) > a(1).getDouble(2))
  }

  test("result is partition-count invariant") {
    val bigRaw = (1L to 50L).map(i =>
      i -> (if (i % 3 == 0) s"wiki text article extra$i" else s"spam buy pills junk$i"))
    val r1 = bigRaw.toDF("doc_id", "text").repartition(1)
    val r7 = bigRaw.toDF("doc_id", "text").repartition(7)
    val a = Dsir.importanceWeights(target, r1, "doc_id", "text").orderBy("doc_id").collect()
    val b = Dsir.importanceWeights(target, r7, "doc_id", "text").orderBy("doc_id").collect()
    assert(a === b)
  }
}
