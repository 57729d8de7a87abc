package graft.ops

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-size top-k selection as a map-side-combinable aggregate.
  *
  * The scale fix for the ANN family's selection step: ranking candidates
  * with `row_number().over(Window.partitionBy(query_id))` funnels EVERY
  * candidate row for a query through one task and fully sorts it — at
  * 100 TB, lshTopK's ~0.4%-of-corpus candidate set per query is hundreds
  * of MB through a single reducer, and brute force is the whole corpus.
  * This aggregator keeps a sorted buffer of at most k (id, sim) entries,
  * so each map task reduces its slice of the candidates to k rows before
  * the shuffle (`ObjectHashAggregate` partial → final); the exchange
  * carries ≤ k rows per (query, map task) instead of the full candidate
  * set, and no per-query sort ever materializes.
  *
  * Total order: sim descending, then id ascending — identical tie-breaking
  * to the `row_number` it replaces, so results are bit-equal.
  */
class TopKAggregator[I: TypeTag](k: Int)(implicit idOrd: Ordering[I])
    extends Aggregator[(I, Double), Seq[(I, Double)], Seq[(I, Double)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def beats(a: (I, Double), b: (I, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && idOrd.lt(a._1, b._1))

  override def zero: Seq[(I, Double)] = Vector.empty

  // buffer invariant: sorted best-first, size <= k
  private def insert(buf: Seq[(I, Double)], x: (I, Double)): Seq[(I, Double)] =
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(beats(_, x))
      ((pre :+ x) ++ post).take(k)
    }

  override def reduce(buf: Seq[(I, Double)], row: (I, Double)): Seq[(I, Double)] =
    insert(buf, row)

  override def merge(a: Seq[(I, Double)], b: Seq[(I, Double)]): Seq[(I, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(I, Double)]): Seq[(I, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(I, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(I, Double)]] = ExpressionEncoder()
}

object TopKAggregator {

  /** Per-group top-k of `idCol` ranked by `simCol` (desc, id-asc ties):
    * (groupCol, outId, outSim, outRank 1-based INT), at most k rows per
    * group, groups with no input rows absent — exactly the frame
    * `row_number <= k` produces, without the per-group sort.
    *
    * The id column's native type drives the tie-break ordering (numeric
    * ids compare numerically; strings by CODE POINT, matching UTF8String's
    * binary order in the window's ORDER BY — Ordering.String compares
    * UTF-16 units, which disagrees beyond the BMP) and is restored on
    * output. NULL sims are dropped before aggregation (unknown similarity
    * can't rank; the window it replaces sorted them last, so results only
    * differ for groups with fewer than k non-null candidates).
    */
  /** Code-point string order = UTF8String binary order (what a window's
    * ORDER BY on a string column uses); Ordering.String (UTF-16 units)
    * sorts supplementary-plane characters before U+E000..U+FFFF.
    */
  private val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  def topKByGroup(
      scored0: DataFrame,
      groupCol: String,
      idCol: String,
      simCol: String,
      k: Int,
      outId: String = "neighbor_id",
      outSim: String = "sim",
      outRank: String = "rank"): DataFrame = {
    // null sims/ids would crash the non-nullable tuple encoder (and a
    // null id can't be a neighbor); NaN sims would break the sorted-buffer
    // invariant (beats() is false both ways for NaN, so a NaN row inserts
    // at the head while the buffer is short yet drops once it's full —
    // partition-order-dependent output). Both are filtered: an unknown
    // similarity can't rank. The window this replaces ranked NULL last and
    // NaN FIRST (Spark orders NaN as largest) — results differ only for
    // groups with fewer than k well-formed candidates, documented here.
    val scored = scored0.filter(
      col(simCol).isNotNull && col(idCol).isNotNull &&
        !col(simCol).cast("double").isNaN)
    val idType = scored.schema(idCol).dataType

    def run[I: TypeTag: Ordering](df: DataFrame): DataFrame = {
      val agg = udaf(new TopKAggregator[I](k))
      df.groupBy(col(groupCol))
        .agg(agg(col(idCol), col(simCol).cast("double")).as("topk"))
        .select(col(groupCol), posexplode(col("topk")))
        .select(col(groupCol),
          col("col._1").cast(idType).as(outId),
          col("col._2").as(outSim),
          (col("pos") + 1).cast("int").as(outRank))
    }

    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        run[Long](scored.withColumn(idCol, col(idCol).cast(LongType)))
      case FloatType | DoubleType =>
        run[Double](scored.withColumn(idCol, col(idCol).cast(DoubleType)))
      case StringType => run[String](scored)(implicitly, codePointOrdering)
      case t => throw new IllegalArgumentException(
        s"topKByGroup: unsupported id type $t (need integral, floating, or string)")
    }
  }
}
