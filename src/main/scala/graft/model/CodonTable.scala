package graft.model

/** Standard codon table incl. N-wildcard entries that still resolve to a
  * unique amino acid (ref: /root/reference/seqtables/core/library_utils.py:8-134).
  * Unknown / unresolvable codons translate to 'X'.
  */
object CodonTable {
  val Standard: Map[String, Char] = {
    val base = Map(
      "TTT" -> 'F', "TTC" -> 'F', "TTA" -> 'L', "TTG" -> 'L',
      "CTT" -> 'L', "CTC" -> 'L', "CTA" -> 'L', "CTG" -> 'L',
      "ATT" -> 'I', "ATC" -> 'I', "ATA" -> 'I', "ATG" -> 'M',
      "GTT" -> 'V', "GTC" -> 'V', "GTA" -> 'V', "GTG" -> 'V',
      "TCT" -> 'S', "TCC" -> 'S', "TCA" -> 'S', "TCG" -> 'S',
      "CCT" -> 'P', "CCC" -> 'P', "CCA" -> 'P', "CCG" -> 'P',
      "ACT" -> 'T', "ACC" -> 'T', "ACA" -> 'T', "ACG" -> 'T',
      "GCT" -> 'A', "GCC" -> 'A', "GCA" -> 'A', "GCG" -> 'A',
      "TAT" -> 'Y', "TAC" -> 'Y', "TAA" -> '*', "TAG" -> '*',
      "CAT" -> 'H', "CAC" -> 'H', "CAA" -> 'Q', "CAG" -> 'Q',
      "AAT" -> 'N', "AAC" -> 'N', "AAA" -> 'K', "AAG" -> 'K',
      "GAT" -> 'D', "GAC" -> 'D', "GAA" -> 'E', "GAG" -> 'E',
      "TGT" -> 'C', "TGC" -> 'C', "TGA" -> '*', "TGG" -> 'W',
      "CGT" -> 'R', "CGC" -> 'R', "CGA" -> 'R', "CGG" -> 'R',
      "AGT" -> 'S', "AGC" -> 'S', "AGA" -> 'R', "AGG" -> 'R',
      "GGT" -> 'G', "GGC" -> 'G', "GGA" -> 'G', "GGG" -> 'G'
    )
    // N-wildcard codons whose amino acid is unambiguous regardless of the
    // wildcard base, e.g. "TCN" -> 'S' (the reference enumerates these
    // explicitly at library_utils.py:8-134).
    val wildcard = for {
      prefix <- Seq("TT", "TC", "CT", "CC", "CA", "CG", "AT", "AC", "AA",
        "AG", "GT", "GC", "GA", "GG", "TA", "TG")
      codon = prefix + "N"
      aas = "ACGT".map(b => base(prefix + b)).toSet
      if aas.size == 1
    } yield codon -> aas.head
    base ++ wildcard
  }

  /** Translate an NT sequence in the given frame.
    * (ref: library_utils.py:173-186 `translate`).
    * @param frame 0-based frame shift
    * @param pad   if true, right-pad to a multiple of 3 with N; else truncate
    */
  def translate(seq: String, frame: Int = 0, pad: Boolean = true): String = {
    val shifted0 = seq.drop(frame).toUpperCase
    val shifted =
      if (pad && shifted0.length % 3 != 0)
        shifted0 + ("N" * (3 - shifted0.length % 3))
      else shifted0.dropRight(shifted0.length % 3)
    shifted.grouped(3).map(c => Standard.getOrElse(c, 'X')).mkString
  }

  /** Split an NT sequence into codon triplets (ref: library_utils.py:189-200). */
  def codons(seq: String, frame: Int = 0): Seq[String] = {
    val s = seq.drop(frame)
    s.dropRight(s.length % 3).grouped(3).toSeq
  }

  /** 1-based NT position → (1-based AA residue, offset-in-codon 0..2)
    * (ref: library_utils.py:203-236).
    */
  def ntPosToResidue(ntPos: Int, frame: Int = 0): (Int, Int) = {
    val idx = ntPos - 1 - frame
    ((idx / 3) + 1, idx % 3)
  }
}
