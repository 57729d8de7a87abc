package graft.model

/** F5 library/amplicon helpers
  * (ref: /root/reference/seqtables/core/library_utils.py:164-306):
  * locate a (possibly degenerate) amplicon inside a wild-type sequence and
  * derive the positional metadata downstream masks need. Driver-side
  * config parsing — the outputs are small literals broadcast into queries.
  */
object LibraryUtils {

  /** FASTA text → ordered (name, sequence) pairs; driver-side twin of
    * `open_fasta` for config-sized files (the distributed reader is
    * graft.io.Fasta).
    */
  def openFasta(text: String): Seq[(String, String)] = {
    val recs = text.split(">").filter(_.trim.nonEmpty)
    recs.toSeq.map { r =>
      val lines = r.split("\n")
      (lines.head.split("\\s+").head, lines.tail.mkString("").replaceAll("[\r\n]", ""))
    }
  }

  /** Alignment details of a library amplicon against a wild-type sequence:
    * 1-based NT start/end of the amplicon in `wtSeq` (via IUPAC-degenerate
    * regex search), the frame offset, and the 1-based residue window
    * (ref: get_read_alignment_details, library_utils.py:239-306).
    */
  final case class AlignmentDetails(
      ntStart: Int, ntEnd: Int, frame: Int, resStart: Int, resEnd: Int)

  def readAlignmentDetails(ampliconSeq: String, wtSeq: String): Option[AlignmentDetails] = {
    val pattern = Alphabets.seqToRegex(ampliconSeq.toUpperCase).r
    pattern.findFirstMatchIn(wtSeq.toUpperCase).map { m =>
      val ntStart = m.start + 1
      val ntEnd = m.end // m.end is exclusive 0-based == inclusive 1-based
      val frame = (ntStart - 1) % 3
      val (resStart, _) = CodonTable.ntPosToResidue(ntStart)
      val (resEnd, _) = CodonTable.ntPosToResidue(ntEnd)
      AlignmentDetails(ntStart, ntEnd, frame, resStart, resEnd)
    }
  }

  /** Expected-mutation mask: positions (1-based, within the amplicon) where
    * the library design allows variation — i.e. where the degenerate
    * amplicon letter covers more than one base
    * (ref: the NT/AA masks built at library_utils.py:270-300).
    */
  def expectedMutationPositions(ampliconSeq: String): Seq[Int] =
    ampliconSeq.toUpperCase.zipWithIndex.collect {
      case (c, i) if Alphabets.IupacDna.get(c).exists(_.length > 1) => i + 1
    }
}
