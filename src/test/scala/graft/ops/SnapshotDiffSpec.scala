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

  private def apply(changes: Seq[(Long, Long, String, String)]) =
    SnapshotDiff.applyChangeSet(oldSnap,
      changes.toDF("doc_id", "version", "op", "text"), "doc_id", Seq("text"))
      .as[(Long, String)].collect().toMap

  test("applyChangeSet: edit, delete, insert, pass-through") {
    val got = apply(Seq(
      (2L, 1L, "upsert", "beta v2"),
      (3L, 1L, "delete", null),
      (9L, 1L, "upsert", "nine")))
    assert(got === Map(1L -> "alpha", 2L -> "beta v2", 4L -> "delta", 9L -> "nine"))
  }

  test("applyChangeSet: last writer wins by version; delete of unknown id is a no-op") {
    val got = apply(Seq(
      (2L, 2L, "upsert", "v2"),
      (2L, 5L, "upsert", "v5"),
      (2L, 3L, "upsert", "v3"),
      (4L, 2L, "upsert", "edited"),
      (4L, 3L, "delete", null),    // later delete beats the edit
      (77L, 9L, "delete", null)))  // never existed
    assert(got === Map(1L -> "alpha", 2L -> "v5", 3L -> "gamma"))
  }

  test("applyChangeSet: exact version tie resolves upsert over delete (struct order)") {
    val got = apply(Seq(
      (1L, 7L, "delete", null),
      (1L, 7L, "upsert", "survivor")))
    assert(got(1L) == "survivor")
    // and the election is partition-order free
    val big = (1 to 50).map(v => (1L, v.toLong, "upsert", s"v$v")) :+
      (1L, 50L, "delete", null.asInstanceOf[String])
    val a = SnapshotDiff.applyChangeSet(oldSnap,
      big.toDF("doc_id", "version", "op", "text").repartition(7),
      "doc_id", Seq("text")).as[(Long, String)].collect().toMap
    assert(a(1L) == "v50") // upsert beats delete at the tied max version
  }
}
