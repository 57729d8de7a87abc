package graft.align

/** One CIGAR event, e.g. CigarOp('M', 295). */
final case class CigarOp(op: Char, n: Int)

/** CIGAR string parsing and derived coordinates.
  *
  * Semantics mirror the reference parser
  * (/root/reference/seqtables/core/internals/cython/sam_to_arr.pyx:27-77 and
  * the pure-python twin custom_sam_utils.py:63-86): ops are `[0-9]+[MIDNSHP=XB]`,
  * `N` is treated as a deletion for end-position math, `S` as a clip.
  */
object Cigar {
  private val Token = "(\\d+)([MIDNSHP=XB])".r

  /** Parse a CIGAR string into its ordered events. "*" (unaligned) and
    * unparseable input → empty.
    */
  def parse(cigar: String): IndexedSeq[CigarOp] =
    if (cigar == null || cigar.isEmpty || cigar == "*") Vector.empty
    else Token.findAllMatchIn(cigar)
      .map(m => CigarOp(m.group(2).head, m.group(1).toInt)).toVector

  /** Totals used for the global window: (insertions, deletions+skips, softclips). */
  def totals(ops: Seq[CigarOp]): (Int, Int, Int) = {
    var ins = 0; var del = 0; var clip = 0
    ops.foreach {
      case CigarOp('I', n) => ins += n
      case CigarOp('D', n) => del += n
      case CigarOp('N', n) => del += n
      case CigarOp('S', n) => clip += n
      case _ =>
    }
    (ins, del, clip)
  }

  /** Last reference position covered by the alignment:
    * pos + len(seq) + D + N − I − 1 − S (ref: sam_to_arr.pyx:256-258).
    */
  def endPos(pos: Int, seqLen: Int, cigar: String): Int = {
    val (ins, del, clip) = totals(parse(cigar))
    pos + seqLen + del - ins - 1 - clip
  }

  /** Leading softclip length, `^(\d+)S` (ref: custom_sam_utils.py:89-99). */
  def nTerminalSoftclip(cigar: String): Int = parse(cigar) match {
    case CigarOp('S', n) +: _ => n
    case _                    => 0
  }

  /** Trailing softclip length, `(\d+)S$` (ref: custom_sam_utils.py:102-112). */
  def cTerminalSoftclip(cigar: String): Int = parse(cigar) match {
    case _ :+ CigarOp('S', n) => n
    case _                    => 0
  }

  /** Total matched bases, sum of M events (ref: custom_sam_utils.py:115-121). */
  def baseHits(cigar: String): Int =
    parse(cigar).collect { case CigarOp('M', n) => n }.sum

  /** Reference-consumed span: sum of M/D/N/=/X events (SAM spec §1.4) —
    * the alignment's footprint on the reference, used for BAI binning and
    * region-overlap tests.
    */
  def refConsumed(cigar: String): Int =
    parse(cigar).collect {
      case CigarOp(op, n) if op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X' => n
    }.sum
}
