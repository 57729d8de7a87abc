package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    .toDF("doc_id", "text")
  private val newSnap = Seq(
    (1L, "alpha"),            // unchanged
    (2L, "beta edited"),      // changed
    (4L, "delta"),            // unchanged
    (9L, "brand new"))        // added; 3 removed
    .toDF("doc_id", "text")

  test("per-id statuses are exact, with char columns null on the absent side") {
    val d = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(d(1L) === ("unchanged", Some(5), Some(5)))
    assert(d(2L) === ("changed", Some(4), Some(11)))
    assert(d(3L) === ("removed", Some(5), None))
    assert(d(4L) === ("unchanged", Some(5), Some(5)))
    assert(d(9L) === ("added", None, Some(9)))
  }

  test("summary counts and char deltas add up") {
    val s = SnapshotDiff.diffSummary(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s === Map(
      "unchanged" -> (2L, 0L),
      "changed" -> (1L, 7L),   // 11 - 4
      "removed" -> (1L, -5L),
      "added" -> (1L, 9L)))
  }
}
