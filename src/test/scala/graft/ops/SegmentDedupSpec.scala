package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[SegmentDedup]]: first-occurrence election order, within-doc
  * repeats, reassembly order, zero-survivor accounting, the hashed-key
  * variant, and partition-count invariance. The driver oracle replays
  * the token-window pipeline end to end (q_segment_dedup).
  */
class SegmentDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int, hashKey: Boolean = false) =
    SegmentDedup.dedupSegments(
      docs.toDF("doc_id", "text"), "doc_id",
      SegmentDedup.tokenWindowSegments(col("text"), window), hashKey)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))

  test("first global occurrence wins; later docs lose the shared segment") {
    // window=2: doc 1 = [a b][c d], doc 2 = [c d][e f] — "c d" is doc 1's
    val out = run(Seq(1L -> "a b c d", 2L -> "c d e f"), window = 2)
    assert(out === Seq(
      (1L, 2, 2L, "a b c d"),
      (2L, 2, 1L, "e f")))
  }

  test("election is by (doc_id, idx) ascending, not arrival order") {
    // the shared segment sits at idx 1 in doc 3 and idx 0 in doc 5:
    // doc 3 wins on doc_id regardless of position
    val out = run(Seq(5L -> "x y q r", 3L -> "a b x y"), window = 2)
    assert(out === Seq(
      (3L, 2, 2L, "a b x y"),
      (5L, 2, 1L, "q r")))
  }

  test("a segment repeated within one document keeps only its first copy") {
    val out = run(Seq(1L -> "a b a b c d"), window = 2)
    assert(out === Seq((1L, 3, 2L, "a b c d")))
  }

  test("a document whose every segment lost stays with n_kept=0, empty text") {
    val out = run(Seq(1L -> "a b c d", 2L -> "a b", 3L -> "c d"), window = 2)
    assert(out === Seq(
      (1L, 2, 2L, "a b c d"),
      (2L, 1, 0L, ""),
      (3L, 1, 0L, "")))
  }

  test("reassembly preserves original segment order") {
    val out = run(Seq(1L -> "z z p p m m"), window = 2)
    assert(out.head._4 == "z z p p m m")
  }

  test("trailing short segment is its own unit, not merged") {
    // "e" (the 1-token tail) != "e f" elsewhere — both survive
    val out = run(Seq(1L -> "a b c d e", 2L -> "e f g h"), window = 2)
    assert(out === Seq(
      (1L, 3, 3L, "a b c d e"),
      (2L, 2, 2L, "e f g h")))
  }

  test("blank and empty documents produce no output row") {
    val out = run(Seq(1L -> "a b", 2L -> "", 3L -> "   "), window = 2)
    assert(out.map(_._1) === Seq(1L))
  }

  test("hashed-key variant agrees with the string-key path") {
    val docs = (1L to 40L).map(i =>
      i -> s"common header tok${i % 7} tok${i % 5} body$i unique$i tail words here")
    assert(run(docs, window = 3, hashKey = true) === run(docs, window = 3))
  }

  test("result is partition-count invariant") {
    val docs = (1L to 30L).map(i => i -> s"seg${i % 4} a b c seg${i % 3} d e f")
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df7 = docs.toDF("doc_id", "text").repartition(7)
    val a = SegmentDedup.dedupSegments(df1, "doc_id",
      SegmentDedup.tokenWindowSegments(col("text"), 4)).orderBy("doc_id").collect()
    val b = SegmentDedup.dedupSegments(df7, "doc_id",
      SegmentDedup.tokenWindowSegments(col("text"), 4)).orderBy("doc_id").collect()
    assert(a === b)
  }

  test("lineSegments splits on newlines and drops blank lines") {
    val segs = Seq(Tuple1("para one\n\npara two\n   \npara one"))
      .toDF("text")
      .select(SegmentDedup.lineSegments(col("text")).as("s"))
      .head().getSeq[String](0)
    assert(segs === Seq("para one", "para two", "para one"))
  }
}
