package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Decontaminate]]: n-gram construction (normalization, the
  * shorter-than-n guard, distinctness), exact overlap counting with
  * `minShared`, the `sameIdSpace` self-pair contract, and the anti-join.
  * The driver oracle re-checks overlapPairs end-to-end on the documents
  * table (q_decontaminate / q_decontam_survivors).
  */
class DecontaminateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("wordNgrams: lowercased, trimmed, distinct; shorter-than-n is empty") {
    val df = Seq(
      (1L, "  The quick Brown fox  "),
      (2L, "a b"),
      (3L, "x y x y x y"),
      (4L, "solo")
    ).toDF("id", "text")
    val got = df
      .select(col("id"), Decontaminate.wordNgrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("the quick brown", "quick brown fox"))
    assert(got(2L) == Seq.empty) // 2 tokens < n: the descending-sequence trap
    assert(got(3L) == Seq("x y x", "y x y")) // repeats collapse to distinct
    assert(got(4L) == Seq.empty)
  }

  test("wordNgrams rejects non-positive n") {
    intercept[IllegalArgumentException] {
      Decontaminate.wordNgrams(lit("a b c"), 0)
    }
  }

  private val docs = Seq(
    (10L, "one two three four five"), // grams: {one two three, two three four, three four five}
    (11L, "ONE two   three zzz"), // {one two three, two three zzz} — case/whitespace noise
    (12L, "nothing shared here at all")
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (90L, "one two three four") // grams: {one two three, two three four}
  ).toDF("bench_id", "text")

  test("overlapPairs counts distinct shared n-grams exactly") {
    val got = Decontaminate
      .overlapPairs(docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 90L, 2L), (11L, 90L, 1L)))
  }

  test("overlapPairs honors minShared") {
    val got = Decontaminate
      .overlapPairs(docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 90L, 2L)))
  }

  test("sameIdSpace=true drops id collisions as self-pairs; false keeps them") {
    val d = Seq((1L, "a b c d"), (2L, "a b c x")).toDF("doc_id", "text")
    // bench id 1 collides with doc 1's id but is a DIFFERENT document
    val b = Seq((1L, "a b c qq")).toDF("bench_id", "text")
    val same = Decontaminate
      .overlapPairs(d, "doc_id", "text", b, "bench_id", "text", n = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(same == Set((2L, 1L, 1L))) // (1,1) suppressed as a self-pair
    val disjoint = Decontaminate
      .overlapPairs(d, "doc_id", "text", b, "bench_id", "text", n = 3,
        sameIdSpace = false)
      .as[(Long, Long, Long)].collect().toSet
    assert(disjoint == Set((1L, 1L, 1L), (2L, 1L, 1L)))
  }

  test("hashed-gram path reports the same pairs as the string path") {
    def run(hashed: Boolean) = Decontaminate
      .overlapPairs(docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minShared = 1, hashGrams = hashed)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(hashed = true) == run(hashed = false))
    assert(run(hashed = true).nonEmpty)
  }

  test("hashed == string pair set on the REAL documents table (sf0.001)") {
    // q_decontam_hashed reuses q_decontaminate's string-path oracle SQL,
    // so a gram-hash collision in the testdata would surface at the gate
    // as an unexplained hash mismatch. This pin runs both paths on the
    // actual driver fixture: if testdata regeneration ever introduced a
    // collision, THIS test names the cause instead.
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = real.filter(col("doc_id") % 53 === 0)
    def pairs(hashed: Boolean) = Decontaminate
      .overlapPairs(real, "doc_id", "text", bench, "doc_id", "text",
        n = 3, minShared = 2, hashGrams = hashed)
      .as[(Long, Long, Long)].collect().toSet
    val s = pairs(hashed = false)
    assert(s.nonEmpty, "fixture produced no contamination pairs — bench slice empty?")
    assert(pairs(hashed = true) == s,
      "hashed-gram pair set diverged from the string path: 64-bit gram " +
        "collision in the current testdata — q_decontam_hashed's oracle " +
        "reuse is no longer sound")
  }

  test("decontaminate anti-joins every flagged document, keeps the rest") {
    val survivors = Decontaminate
      .decontaminate(docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(12L))
    // a stricter threshold spares the 1-gram-overlap doc
    val lax = Decontaminate
      .decontaminate(docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(lax == Set(11L, 12L))
  }
}
