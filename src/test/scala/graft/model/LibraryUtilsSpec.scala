package graft.model

import org.scalatest.funsuite.AnyFunSuite

class LibraryUtilsSpec extends AnyFunSuite {

  test("openFasta parses multi-record wrapped text") {
    val recs = LibraryUtils.openFasta(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    assert(recs == Seq(("a", "ACGTACGT"), ("b", "TTTT")))
  }

  test("readAlignmentDetails locates degenerate amplicons") {
    //                      123456789012345
    val wt =               "AAACGTGCATGCAAA"
    val d = LibraryUtils.readAlignmentDetails("CGTGCNTGC", wt).get
    assert(d.ntStart == 4 && d.ntEnd == 12)
    assert(d.frame == 0)
    assert(d.resStart == 2 && d.resEnd == 4)
    assert(LibraryUtils.readAlignmentDetails("GGGGGG", wt).isEmpty)
  }

  test("expectedMutationPositions flags degenerate letters only") {
    assert(LibraryUtils.expectedMutationPositions("ACNGTK") == Seq(3, 6))
    assert(LibraryUtils.expectedMutationPositions("ACGT").isEmpty)
  }
}
