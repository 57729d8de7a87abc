package graft.model

/** Metadata carried alongside a SeqTable DataFrame — the Spark analog of the
  * reference's `DataArray.attrs['seqtable']` dict
  * (ref: /root/reference/seqtables/core/internals/constructor_ops.py:331-358).
  *
  * @param seqType     "NT" or "AA"
  * @param phredAdjust phred ASCII offset (default 33)
  * @param hasQuality  whether the quality plane is populated
  * @param references  reference sequence names seen at ingest
  */
final case class SeqTableMeta(
    seqType: String = "NT",
    phredAdjust: Int = Alphabets.PhredAdjust,
    hasQuality: Boolean = false,
    references: Seq[String] = Nil) {
  def fillNa: Char = Alphabets.fillFor(seqType)
}
