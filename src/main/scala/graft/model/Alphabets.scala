package graft.model

/** Alphabets, sentinels and degenerate-letter maps.
  *
  * Semantics derived from the reference implementation:
  * `/root/reference/seqtables/core/utils/alphabets.py:1-39` (alphabets, IUPAC
  * degeneracy, extended CIGAR alphabet) and
  * `/root/reference/seqtables/core/internals/constructor_ops.py:294` (fill values).
  */
object Alphabets {
  val Dna: Seq[Char] = "ACGT".toSeq
  val DnaExtended: Seq[Char] = "ACGTN".toSeq
  val AminoAcids: Seq[Char] = "ACDEFGHIKLMNPQRSTVWY".toSeq
  val AminoAcidsExtended: Seq[Char] = "ACDEFGHIKLMNPQRSTVWYX*".toSeq

  /** CIGAR operation letters (SAM spec). */
  val CigarOps: Set[Char] = "MIDNSHP=XB".toSet

  /** IUPAC degenerate DNA letters → concrete base sets
    * (ref: seqtables/core/utils/seq_table_util.py:12-28).
    */
  val IupacDna: Map[Char, String] = Map(
    'A' -> "A", 'C' -> "C", 'G' -> "G", 'T' -> "T",
    'R' -> "AG", 'Y' -> "CT", 'S' -> "CG", 'W' -> "AT",
    'K' -> "GT", 'M' -> "AC",
    'B' -> "CGT", 'D' -> "AGT", 'H' -> "ACT", 'V' -> "ACG",
    'N' -> "ACGT"
  )

  /** Expand a degenerate DNA string into a character-class regex
    * (ref: seqtables/core/library_utils.py:154-161).
    */
  def seqToRegex(seq: String): String =
    seq.map { c =>
      IupacDna.get(c.toUpper) match {
        case Some(s) if s.length == 1 => s
        case Some(s)                  => s"[$s]"
        case None                     => java.util.regex.Pattern.quote(c.toString)
      }
    }.mkString

  // Sentinel characters — must be preserved exactly
  // (ref: constructor_ops.py:209, sam_to_arr.pyx:123-204, st_merge.py:115).
  /** Read does not cover this reference position. */
  val EdgeGap: Char = '$'
  /** Deletion in read (CIGAR D); also merge fill. */
  val Deletion: Char = '-'
  /** Skipped region (CIGAR N, e.g. intron). */
  val Skip: Char = '.'
  /** Unknown nucleotide / NT fill. */
  val FillNt: Char = 'N'
  /** Unknown amino acid / AA fill. */
  val FillAa: Char = 'X'
  /** Null quality character (phred 0 at the default adjust of 33). */
  val NullQual: Char = '!'
  /** Default phred offset (ref: constructor_ops.py:192). */
  val PhredAdjust: Int = 33

  /** Fill letter for a sequence type (ref: constructor_ops.py:294). */
  def fillFor(seqType: String): Char =
    if (seqType == "AA") FillAa else FillNt

  /** Confidence tier of a [[guessSeqType]] call — the reference's warning
    * contract (constructor_ops.py:64-78): the middle tiers `warnings.warn`
    * because degenerate-DNA letters are a subset of the AA alphabet (the
    * guess could be a constricted AA set), and letters outside both
    * alphabets make the AA default a shrug. `warning` carries the
    * reference's rationale so call sites can log or surface it.
    */
  sealed abstract class GuessTier(val warning: Option[String])
  object GuessTier {
    /** Letters identify the type unambiguously (tiers 1 and 3). */
    case object Unambiguous extends GuessTier(None)
    /** Only DNA + degenerate-DNA letters — assumed NT, but could be a
      * constricted AA residue set (constructor_ops.py:67-69).
      */
    case object DegenerateDna extends GuessTier(Some(
      "sequences contain only DNA and degenerate-DNA letters; assuming NT — " +
        "set the sequence type explicitly if they are amino acids"))
    /** Letters outside both alphabets — defaulted to AA
      * (constructor_ops.py:75-78).
      */
    case object OutsideAlphabet extends GuessTier(Some(
      "sequences contain letters outside the known NT and AA alphabets; " +
        "defaulting to AA — set the sequence type explicitly if wrong"))
  }

  /** Infer NT vs AA from the alphabet of the sampled sequences, with the
    * reference's confidence tier (ref: constructor_ops.py:39-78
    * `guess_seqtype`). Decision tree, after stripping sentinels ($-.*):
    * pure ACTG → (NT, unambiguous); within degenerate DNA (incl. N/U) →
    * (NT, [[GuessTier.DegenerateDna]]); within the AA alphabet (incl. X) →
    * (AA, unambiguous); anything else → (AA,
    * [[GuessTier.OutsideAlphabet]]).
    */
  def guessSeqTypeTiered(samples: Iterable[String]): (String, GuessTier) = {
    val letters: Set[Char] =
      samples.iterator.flatMap(_.iterator).map(_.toUpper).toSet --
        Set(EdgeGap, Deletion, Skip, '*')
    val dnaStrict = Set('A', 'C', 'G', 'T')
    val dnaDegenerate = IupacDna.keySet ++ Set('U') // reference all_dna
    val aaAll = AminoAcidsExtended.toSet // reference all_aa (incl. X)
    if (letters.subsetOf(dnaStrict)) ("NT", GuessTier.Unambiguous)
    else if (letters.subsetOf(dnaDegenerate)) ("NT", GuessTier.DegenerateDna)
    else if (letters.subsetOf(aaAll)) ("AA", GuessTier.Unambiguous)
    else ("AA", GuessTier.OutsideAlphabet)
  }

  /** [[guessSeqTypeTiered]] without the tier — the common call shape. */
  def guessSeqType(samples: Iterable[String]): String =
    guessSeqTypeTiered(samples)._1
}
