package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[ExactSubstrings]]: the window-cover identity on hand-built
  * cases (cross-doc duplicates, within-doc repeats, span merging,
  * boundary lengths), symmetric removal, the hashed-key variant, and
  * partition invariance. The driver oracle replays detection + interval
  * merge + text rebuild in SQL (q_exact_substrings).
  */
class ExactSubstringsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], L: Int, hashKey: Boolean = false) =
    ExactSubstrings.removeDuplicatedSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", L, hashKey)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

  test("a shared >=L substring is removed from BOTH documents, exactly") {
    // docs share "0123456789" (10 chars); L=8 flags windows at the shared
    // run only; removal is symmetric
    val out = run(Seq(
      1L -> "aaa0123456789bbb",
      2L -> "xyz0123456789qrs"), L = 8)
    assert(out === Seq(
      (1L, 16, 10, 1, "aaabbb"),
      (2L, 16, 10, 1, "xyzqrs")))
  }

  test("unique documents pass through untouched with zero spans") {
    val out = run(Seq(
      1L -> "completely unique text one",
      2L -> "another different text two"), L = 10)
    assert(out(0) === ((1L, 26, 0, 0, "completely unique text one")))
    assert(out(1) === ((2L, 26, 0, 0, "another different text two")))
  }

  test("a within-document repeat is detected and both copies removed") {
    // "ABCDEFGH" occurs twice inside one doc (L=8): both flagged
    val out = run(Seq(1L -> "ABCDEFGH-middle-ABCDEFGH"), L = 8)
    assert(out.head._3 == 16) // 2 * 8 dup chars
    assert(out.head._4 == 2)
    assert(out.head._5 == "-middle-")
  }

  test("overlapping flagged windows merge into one maximal span") {
    // shared run of 12 chars with L=8 -> 5 overlapping windows -> 1 span
    val out = run(Seq(
      1L -> "aa0123456789ABzz",
      2L -> "bb0123456789AByy"), L = 8)
    assert(out.head._4 == 1)
    assert(out.head._3 == 12)
    assert(out.head._5 == "aazz")
  }

  test("duplicates shorter than L are ignored") {
    val out = run(Seq(
      1L -> "shared7 one suffix alpha",
      2L -> "shared7 two suffix betaz"), L = 12)
    // "shared7 " (8 chars) and " suffix " are < 12-char windows: the
    // longest shared runs are 11 chars or less, nothing flagged
    assert(out.forall(_._4 == 0))
  }

  test("text shorter than L never explodes a window") {
    val out = run(Seq(1L -> "tiny", 2L -> "tiny"), L = 8)
    assert(out === Seq(
      (1L, 4, 0, 0, "tiny"),
      (2L, 4, 0, 0, "tiny")))
  }

  test("whole-document duplicates clean to empty text") {
    val out = run(Seq(1L -> "identical-text-here", 2L -> "identical-text-here"), L = 8)
    assert(out.forall(r => r._5 == "" && r._3 == 19 && r._4 == 1))
  }

  test("hashed-key variant agrees with the string-key path") {
    val docs = (1L to 25L).map { i =>
      i -> (s"unique-prefix-$i SHARED-TEMPLATE-SEGMENT-${i % 3} tail-$i")
    }
    assert(run(docs, L = 15, hashKey = true) === run(docs, L = 15))
  }

  test("windowHashes aligns with charWindows: one hash per position, equal windows hash equal") {
    val t = "abcabcabcXabcabc"
    val L = 5
    val hs = HashKernels.windowHashes(t, L)
    assert(hs.length == t.length - L + 1)
    // window i and window i+3 are the same string inside the abc-run
    assert(hs(0) == hs(3)) // "abcab" twice
    assert(hs(1) == hs(4))
    // distinct windows get distinct hashes on this input
    assert(hs(0) != hs(1) && hs(2) != hs(6))
    // short / null inputs
    assert(HashKernels.windowHashes("abcd", 5).isEmpty)
    assert(HashKernels.windowHashes(null, 5).isEmpty)
  }

  test("sharedWindowMatrix hashed path agrees with the string path") {
    val docs = (1L to 40L).map { i =>
      (i, s"src${i % 4}", s"head-$i COMMON-TEMPLATE-BLOCK-${i % 2}-SHARED tail-$i")
    }.toDF("doc_id", "grp", "text")
    def m(h: Boolean) = ExactSubstrings
      .sharedWindowMatrix(docs, "grp", "text", L = 12, hashKey = h)
      .orderBy("group_a", "group_b").collect().toSeq
    assert(m(true) === m(false))
  }

  test("sharedWindowMatrix counts distinct cross-group windows, ordered pairs") {
    // groups x and y share exactly the 10-char run "0123456789" (3 distinct
    // 8-windows); z shares nothing
    val docs = Seq(
      (1L, "x", "aa0123456789bb"),
      (2L, "y", "cc0123456789dd"),
      (3L, "y", "ee0123456789ff"), // same shared windows again: still distinct-counted once
      (4L, "z", "completely-unrelated-text")).toDF("doc_id", "grp", "text")
    val got = ExactSubstrings.sharedWindowMatrix(docs, "grp", "text", L = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 3L)))
  }

  test("result is partition-count invariant") {
    val docs = (1L to 30L).map(i =>
      i -> s"doc$i common-boilerplate-license-header-text body-$i")
    val a = ExactSubstrings.removeDuplicatedSubstrings(
      docs.toDF("doc_id", "text").repartition(1), "doc_id", "text", 20)
      .orderBy("doc_id").collect()
    val b = ExactSubstrings.removeDuplicatedSubstrings(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", 20)
      .orderBy("doc_id").collect()
    assert(a === b)
  }
}
