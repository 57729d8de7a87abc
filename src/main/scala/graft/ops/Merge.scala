package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SeqTable
import graft.model.Alphabets

/** U1-U3 `merge_seqs` / `st_merge_arrays`
  * (ref: seqtables.py:114-118, xarray_mods/st_merge.py:17-138).
  *
  * The reference initializes a (reads × union-positions) canvas filled with
  * '-'/'!' and overwrites per table, later tables winning on overlap
  * (st_merge.py:67). Spark-first shapes:
  *  - axis 0 (stack reads): re-pad each wide row into the union window —
  *    map-only, then `unionByName`. No shuffle at all.
  *  - axis 1 (outer-align on read ids): full outer join on read_id, then a
  *    per-position coalesce with later-wins precedence, computed on the
  *    padded wide strings with `zip_with` — one join, no explode.
  */
object Merge {

  private val MergeFill = Alphabets.Deletion.toString // '-' (st_merge.py:115)
  private val QualFill = Alphabets.NullQual.toString

  /** Re-pad a table's wide strings into [minPos, maxPos] with merge fill. */
  private def repad(t: SeqTable, minPos: Int, maxPos: Int): DataFrame = {
    val left = t.minPos - minPos
    val right = maxPos - t.maxPos
    t.reads.select(
      col("read_id"),
      concat(lit(MergeFill * left), col("seq"), lit(MergeFill * right)).as("seq"),
      concat(lit(QualFill * left), col("qual"), lit(QualFill * right)).as("qual"))
  }

  /** Axis-0 merge: concatenate read sets over the union position window.
    * `renumber` mirrors ignore_read_index: read ids get a per-table suffix
    * so duplicates across tables stay distinct.
    */
  def stackReads(tables: Seq[SeqTable], renumber: Boolean = false): SeqTable = {
    require(tables.nonEmpty)
    require(tables.map(_.meta.seqType).distinct.size == 1,
      "cannot merge tables of different seq_type (st_merge.py asserts this)")
    val minPos = tables.map(_.minPos).min
    val maxPos = tables.map(_.maxPos).max
    val reads = tables.zipWithIndex.map { case (t, i) =>
      val r = repad(t, minPos, maxPos)
      if (renumber) r.withColumn("read_id", concat(col("read_id"), lit(s"_t$i"))) else r
    }.reduce(_ unionByName _)
    val ins = tables.zipWithIndex.map { case (t, i) =>
      if (renumber) t.insertions.withColumn("read_id", concat(col("read_id"), lit(s"_t$i")))
      else t.insertions
    }.reduce(_ unionByName _)
    SeqTable(reads, ins, tables.head.meta, minPos, maxPos)
  }

  /** Axis-1 merge of two tables: align on read_id; where both cover a
    * position, the LATER table wins over its whole window (the reference
    * overwrites the full row region, including edge gaps).
    */
  def alignReads(first: SeqTable, later: SeqTable,
      dupInsertions: String = "drop"): SeqTable = {
    require(first.meta.seqType == later.meta.seqType)
    val minPos = math.min(first.minPos, later.minPos)
    val maxPos = math.max(first.maxPos, later.maxPos)
    val a = repad(first, minPos, maxPos)
      .withColumnRenamed("seq", "seq_a").withColumnRenamed("qual", "qual_a")
    val b = repad(later, minPos, maxPos)
      .withColumnRenamed("seq", "seq_b").withColumnRenamed("qual", "qual_b")

    // Later-wins inside the later table's own window span; merge fill
    // elsewhere unless the first table covers it.
    val lo = later.minPos - minPos // 0-based offset of later's window
    val hi = later.maxPos - minPos
    def overlay(ca: org.apache.spark.sql.Column, cb: org.apache.spark.sql.Column,
        fill: String) = {
      val winLen = maxPos - minPos + 1
      val aPart = coalesce(ca, lit(fill * winLen))
      when(cb.isNull, aPart).otherwise(
        concat(
          substring(aPart, 1, lo),
          substring(cb, lo + 1, hi - lo + 1),
          substring(aPart, hi + 2, winLen - hi - 1)))
    }
    val reads = a.join(b, Seq("read_id"), "full_outer")
      .select(
        col("read_id"),
        overlay(col("seq_a"), col("seq_b"), MergeFill).as("seq"),
        overlay(col("qual_a"), col("qual_b"), QualFill).as("qual"))

    // U2 merge_attributes insertion policy (st_merge.py:34-54):
    // 'drop' dedups on (read, position, loc); 'ignore' keeps everything.
    val insUnion = first.insertions.unionByName(later.insertions)
    val ins = dupInsertions match {
      case "drop" => insUnion.dropDuplicates("read_id", "position", "loc")
      case _      => insUnion
    }
    SeqTable(reads, ins, first.meta.copy(
      references = (first.meta.references ++ later.meta.references).distinct),
      minPos, maxPos)
  }

  /** N-table axis-1 merge (ref st_merge.py:63 accepts a table list): the
    * later-wins pairwise overlay folded left, so precedence is list order —
    * table i+1 overwrites table i wherever both cover a read's window,
    * matching the reference's sequential merge.
    */
  def alignReadsMulti(tables: Seq[SeqTable], dupInsertions: String = "drop"): SeqTable = {
    require(tables.nonEmpty, "alignReadsMulti: no tables")
    tables.reduceLeft(alignReads(_, _, dupInsertions))
  }
}
