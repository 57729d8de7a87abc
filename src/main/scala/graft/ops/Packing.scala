package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: documents, ordered by id,
  * fill fixed-token-capacity bins ("packs") that a trainer consumes as
  * contiguous batches. The core primitive is an EXACT global running
  * total — and the naive spelling, `sum(x).over(Window.orderBy(id))`,
  * funnels the whole corpus through ONE task (Spark plans an
  * `Exchange SinglePartition` for an un-partitioned ordered window).
  *
  * [[runningTotal]] computes the same number in two phases, both
  * parallel: range-repartition by the order key, cumsum WITHIN each
  * partition (a partition-local window — no single-task exchange), then
  * add each partition's broadcast prefix offset (one tiny collect of
  * numPartitions totals). The plan is pinned by a PlanSpec regression
  * asserting no SinglePartition exchange.
  *
  * Assignment semantics: a document goes to the bin containing its START
  * offset (`floor((cum − tokens) / capacity)`) — the standard contiguous
  * "waterfall" layout; a document longer than the capacity occupies its
  * own bin(s). Deterministic given the id order, partition-invariant,
  * and exactly SQL-expressible, so the driver oracle hash-checks it.
  */
object Packing {

  /** Exact running total of `valCol` ordered by `ordCol` (inclusive), as
    * column `outCol`. Two-phase: local cumsum per range partition +
    * broadcast prefix offsets. `numPartitions` bounds the driver-side
    * offsets collect (one long per partition).
    *
    * Contract: `valCol` must be integral (token counts are; a long cumsum
    * of doubles would silently truncate, so non-integral input throws)
    * and `ordCol` values must be unique (duplicate order keys make any
    * "running" total order-dependent; they also key the final join).
    */
  def runningTotal(
      df: DataFrame,
      ordCol: String,
      valCol: String,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    df.schema(valCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"runningTotal needs an integral value column, got $valCol: $t")
    }
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // only the NARROW (ord, val) projection is pinned: localCheckpoint
    // keeps the offsets job and the cumsum job on the SAME pid layout (a
    // re-planned range exchange could resample boundaries between them),
    // and pinning 8-16 bytes/row instead of the whole frame keeps the
    // materialization negligible at corpus scale; the result joins back
    // on the unique order key
    val ranged = df
      .select(col(ordCol), col(valCol))
      .repartitionByRange(n, col(ordCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localWin = Window.partitionBy(col("__pid")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prefix-exclusive scan over the (tiny) per-partition totals, shipped
    // as ONE array literal indexed by pid — a chained when/otherwise per
    // partition would be O(numPartitions) branch tests per row and blow
    // the codegen method limit at cluster partition counts.
    //
    // The same (already-materialized) pass also ENFORCES the documented
    // contract instead of trusting it: a NULL order key would silently
    // vanish in the join back, and a duplicate would duplicate rows and
    // corrupt cum_tokens. Range partitioning colocates equal (and null)
    // keys, so per-partition count/count(ord)/count_distinct(ord) sum to
    // their global values — the check rides the offsets job for free.
    val offsetsByPid: Seq[Long] = {
      val rows = ranged.groupBy(col("__pid"))
        .agg(sum(col(valCol)).cast("long").as("t"),
          count(lit(1)).as("cnt"),
          count(col(ordCol)).as("nonnull"),
          count_distinct(col(ordCol)).as("dist"))
        .collect()
      val nulls = rows.map(r => r.getLong(2) - r.getLong(3)).sum
      require(nulls == 0L,
        s"runningTotal: order column $ordCol has $nulls NULL value(s); " +
          "null keys cannot be ordered and would be dropped by the join back")
      val dups = rows.map(r => r.getLong(3) - r.getLong(4)).sum
      require(dups == 0L,
        s"runningTotal: order column $ordCol has $dups duplicate value(s); " +
          "a running total over duplicate keys is order-dependent and the " +
          "join back would duplicate rows")
      val totals = rows.map(r => (r.getInt(0), r.getLong(1))).toMap
      var acc = 0L
      (0 until n).map { pid =>
        val off = acc
        acc += totals.getOrElse(pid, 0L)
        off
      }
    }
    val offCol: Column = element_at(typedLit(offsetsByPid), col("__pid") + 1)
    val cum = ranged
      .withColumn(outCol, sum(col(valCol)).over(localWin).cast("long") + offCol)
      .select(col(ordCol), col(outCol))
    df.join(cum, Seq(ordCol))
  }

  /** Assign each row to a fixed-capacity pack by its start offset in the
    * id-ordered token stream. Output: input columns + `cum_tokens`
    * (inclusive running total) + `bin` (0-based pack id).
    */
  def packBySize(
      df: DataFrame,
      ordCol: String,
      tokensCol: String,
      capacity: Long,
      numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive, got $capacity")
    runningTotal(df, ordCol, tokensCol, "cum_tokens", numPartitions)
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokensCol)) / capacity).cast("long"))
  }

  /** Per-pack summary of a [[packBySize]] frame: row count, token total,
    * fill ratio against the capacity. Map-side combinable aggregate.
    */
  def packStats(packed: DataFrame, tokensCol: String, capacity: Long): DataFrame =
    packed.groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("tokens"),
        round(sum(col(tokensCol)) / lit(capacity.toDouble), 6).as("fill"))
}
