package graft.align

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for CIGAR parsing and the realignment kernel — the
  * coordinate/sentinel hard parts of SURVEY §7.4.1.
  */
class CigarSpec extends AnyFunSuite {

  test("parse basic and extended ops") {
    assert(Cigar.parse("10M") == Vector(CigarOp('M', 10)))
    assert(Cigar.parse("3S12M2I4D1N5M") == Vector(
      CigarOp('S', 3), CigarOp('M', 12), CigarOp('I', 2),
      CigarOp('D', 4), CigarOp('N', 1), CigarOp('M', 5)))
    assert(Cigar.parse("*").isEmpty)
    assert(Cigar.parse("").isEmpty)
    assert(Cigar.parse(null).isEmpty)
  }

  test("endPos = pos + len + D + N - I - 1 - S") {
    // plain match: 4 bases at pos 10 covers 10..13
    assert(Cigar.endPos(10, 4, "4M") == 13)
    // deletion extends reference span
    assert(Cigar.endPos(10, 4, "2M2D2M") == 15)
    // insertion consumes read but not reference
    assert(Cigar.endPos(10, 6, "2M2I2M") == 13)
    // softclip consumes read but not reference
    assert(Cigar.endPos(10, 6, "2S4M") == 13)
    // intron skip extends like deletion
    assert(Cigar.endPos(1, 2, "1M3N1M") == 5)
  }

  test("softclip extraction") {
    assert(Cigar.nTerminalSoftclip("5S10M") == 5)
    assert(Cigar.nTerminalSoftclip("10M5S") == 0)
    assert(Cigar.cTerminalSoftclip("10M5S") == 5)
    assert(Cigar.cTerminalSoftclip("5S10M") == 0)
    assert(Cigar.baseHits("3M2I4M") == 7)
  }
}

class AlignReadSpec extends AnyFunSuite {

  private def al(seq: String, qual: String, pos: Int, cigar: String,
      mn: Int, mx: Int): AlignedRead =
    AlignRead.align(seq, qual, pos, cigar, mn, mx).get

  test("simple match with edge gaps") {
    val r = al("ACGT", "IIII", 3, "4M", 1, 8)
    assert(r.seq == "$$ACGT$$")
    assert(r.qual == "!!IIII!!")
    assert(r.insertions.isEmpty)
  }

  test("deletion fills '-' with null quality") {
    val r = al("AC", "IJ", 1, "1M2D1M", 1, 4)
    assert(r.seq == "A--C")
    assert(r.qual == "I!!J")
  }

  test("intron skip fills '.'") {
    val r = al("AC", "IJ", 1, "1M2N1M", 1, 4)
    assert(r.seq == "A..C")
  }

  test("softclip consumes read, not reference") {
    val r = al("XXXACGT", "###IIII", 2, "3S4M", 1, 6)
    assert(r.seq == "$ACGT$")
    assert(r.qual == "!IIII!")
  }

  test("insertions diverted with negative left-of-anchor locs") {
    // 2M writes pos 1-2; 2I anchored at ref pos 3; 1M writes pos 3.
    val r = al("ACGTA", "12345", 1, "2M2I1M", 1, 3)
    assert(r.seq == "ACA")
    // reverse walk: T (last inserted) gets -1, G gets -2, both anchored at 3
    assert(r.insertions.toSet == Set(
      InsertedBase(3, -2, 'G', '3'), InsertedBase(3, -1, 'T', '4')))
  }

  test("read starting before the window is clipped") {
    val r = al("ACGTACGT", "12345678", 1, "8M", 4, 8)
    assert(r.seq == "TACGT")
    assert(r.qual == "45678")
  }

  test("read beyond maxPos is truncated") {
    val r = al("ACGTACGT", "12345678", 3, "8M", 1, 6)
    assert(r.seq == "$$ACGT")
  }

  test("read entirely after window yields all edge gaps") {
    val r = al("ACGT", "IIII", 10, "4M", 1, 4)
    assert(r.seq == "$$$$")
    assert(r.insertions.isEmpty)
  }

  test("unaligned (cigar *) returns None") {
    assert(AlignRead.align("ACGT", "IIII", 1, "*", 1, 4).isEmpty)
  }

  test("missing quality falls back to null quality") {
    val r = al("ACGT", "*", 1, "4M", 1, 4)
    assert(r.qual == "!!!!")
  }

  test("deletion before window start is clipped correctly") {
    // 2M at 1-2, 3D at 3-5, 2M at 6-7; window starts at 4: D partial
    val r = al("ACGT", "IIII", 1, "2M3D2M", 4, 7)
    assert(r.seq == "--GT")
  }

  test("window helper matches endPos over the set") {
    val reads = Seq(("ACGT", 5, "4M"), ("AAAA", 2, "2M2D2M"))
    assert(AlignRead.window(reads) == (2, 8))
  }
}
