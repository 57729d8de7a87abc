package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** F7 `guess_seqtype` tiers (ref: constructor_ops.py:39-78): the guess is
  * four-way — two silent, two with the reference's `warnings.warn` —
  * surfaced here as [[Alphabets.GuessTier]].
  */
class AlphabetsSpec extends AnyFunSuite {
  import Alphabets.GuessTier._

  test("pure ACTG (with sentinels) is unambiguous NT") {
    assert(Alphabets.guessSeqTypeTiered(Seq("ACGT", "AC-T", "AC$T")) ==
      ("NT", Unambiguous))
  }

  test("degenerate-DNA letters (incl. N/U) guess NT with the warning tier") {
    // the reference warns here because RYSWKM… ⊂ the AA alphabet — a
    // constricted residue set would look identical (constructor_ops.py:67)
    val (t1, tier1) = Alphabets.guessSeqTypeTiered(Seq("ACGTN"))
    assert(t1 == "NT" && tier1 == DegenerateDna && tier1.warning.nonEmpty)
    val (t2, tier2) = Alphabets.guessSeqTypeTiered(Seq("ACGRYSWU"))
    assert(t2 == "NT" && tier2 == DegenerateDna)
  }

  test("amino-acid letters are unambiguous AA") {
    assert(Alphabets.guessSeqTypeTiered(Seq("MKVLEQ", "PFIX*")) ==
      ("AA", Unambiguous))
  }

  test("letters outside both alphabets default to AA with the warning tier") {
    val (t, tier) = Alphabets.guessSeqTypeTiered(Seq("MKV!9Z"))
    assert(t == "AA" && tier == OutsideAlphabet && tier.warning.nonEmpty)
  }

  test("guessSeqType stays the tier-less projection") {
    assert(Alphabets.guessSeqType(Seq("ACGTN")) == "NT")
    assert(Alphabets.guessSeqType(Seq("MKVLEQ")) == "AA")
  }
}
