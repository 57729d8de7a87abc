package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via space-filling curves — the file- and
  * row-group-skipping lever that single-column sorting cannot provide.
  *
  * A 100 TB corpus is usually range-filtered on MORE than one column
  * (time AND tenant, partkey AND suppkey, x AND y). Sorting by one column
  * gives that column tight per-file min/max stats and leaves the other
  * uniformly smeared across every file, so a conjunctive box predicate
  * still touches everything. Interleaving the dimensions into a single
  * clustering key (Z-order/Morton, or the strictly-more-local Hilbert
  * curve) makes every file a small hyper-rectangle: min/max footer stats
  * on the ORIGINAL columns become tight simultaneously, and parquet
  * row-group pruning (plus range-partition file pruning) skips everything
  * outside the query box. This is the same design Delta's OPTIMIZE
  * ZORDER BY and Iceberg's sort-order transforms ship; here it is plain
  * Spark: a pure-builtin key expression + repartitionByRange + parquet.
  *
  * Everything below is integer-exact builtin arithmetic — no UDF, no
  * nondeterminism, oracle-checkable in any engine with shifts.
  */
object Layout {

  /** Z-order (Morton) key: bitwise interleave of `cols.size` non-negative
    * integer columns, `bits` low bits each, dimension j contributing bit i
    * to output position `i*d + j`. Pure shift/mask builtins — the whole
    * key rides WholeStageCodegen inside the scan's project.
    *
    * Callers must pre-scale each dimension into [0, 2^bits) —
    * [[gridCell]] for doubles with known bounds, `pmod` for integer ids.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1 && bits >= 1 && d * bits <= 62,
      s"zorderKey: need 1 <= dims*bits <= 62, got $d*$bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a numeric column onto the `2^bits`-cell grid:
    * floor((c - lo) / (hi - lo) * 2^bits), clamped into [0, 2^bits).
    * Out-of-bound values saturate at the edge cells (they stay queryable,
    * just cluster at the border), so a stale lo/hi estimate degrades
    * locality — never correctness.
    */
  def gridCell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo && bits >= 1 && bits <= 31)
    val n = (1L << bits).toDouble
    least(
      greatest(floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n))
        .cast("long"), lit(0L)),
      lit((1L << bits) - 1L))
  }

  /** Hilbert-curve key for a 2^bits x 2^bits grid (2 dims): the classic
    * top-down xy->d bit transform, run as ONE `aggregate` fold over bit
    * positions carrying struct(d, x, y) state. Hilbert keeps every pair
    * of consecutive cells Manhattan-adjacent (Z-order jumps at quadrant
    * seams), so range boxes split into fewer, longer key runs — fewer
    * row-groups touched for the same box.
    *
    * Builtins only: the variable shift inside the lambda is expressed as
    * division by 2^i (exact in doubles for bits <= 30), the `(3*rx) XOR
    * ry` quadrant rank as the arithmetic identity `rx*(3-ry) + (1-rx)*ry`
    * — the same spelling the DuckDB oracle twin uses. Integer-exact and
    * order-free: one row's key never sees another row, so the output is
    * bit-stable under any partitioning.
    */
  def hilbertKey(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, s"hilbertKey: need 1 <= bits <= 30, got $bits")
    val init = struct(
      lit(0L).as("d"), xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val folded = aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      init,
      (acc, i) => {
        val s  = pow(lit(2.0), i.cast("double")).cast("long")
        val sd = s.cast("double")
        val x  = acc.getField("x")
        val y  = acc.getField("y")
        val rx = floor(x.cast("double") / sd).cast("long") % 2
        val ry = floor(y.cast("double") / sd).cast("long") % 2
        val quad = rx * (lit(3L) - ry) + (lit(1L) - rx) * ry // == (3*rx) XOR ry
        val newD = acc.getField("d") + s * s * quad
        // later steps only read bits below i, so reduce the state mod s
        // BEFORE rotating — this keeps it in [0, s) (the raw `s-1-x`
        // reflection would go negative exactly when bit i is set, and
        // unlike the two's-complement `&` spelling, the division-based
        // bit extraction above has no sign to hide behind)
        val xm = pmod(x, s)
        val ym = pmod(y, s)
        // rotation: if ry==0 { if rx==1 reflect both; then swap x<->y }
        val newX = when(ry === 0L, when(rx === 1L, s - 1L - ym).otherwise(ym))
          .otherwise(xm)
        val newY = when(ry === 0L, when(rx === 1L, s - 1L - xm).otherwise(xm))
          .otherwise(ym)
        struct(newD.as("d"), newX.as("x"), newY.as("y"))
      })
    folded.getField("d")
  }

  /** Per-file min/max statistics over `cols` — the manifest a table
    * format (Iceberg/Delta) persists to plan scans without touching
    * data files. One aggregate keyed by `input_file_name()`: state is
    * nFiles × |cols| scalars regardless of row count.
    */
  def fileManifest(reread: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    reread.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-driven pruned read: keep only files whose [min,max] box
    * intersects every requested [lo,hi] range, then scan just those.
    * The manifest filter is per-file interval logic (a file survives iff
    * max_c >= lo AND min_c <= hi for every range); the residual row
    * filter still applies because file stats are necessarily coarse.
    * The collected object is the pruned FILE-PATH LIST — bounded by the
    * shard count, never by rows — which is exactly what any scan
    * planner must materialize to construct splits. Returns (paths kept,
    * total paths, the pruned-and-filtered DataFrame).
    */
  def prunedRead(reread: DataFrame, ranges: Seq[(String, Double, Double)])
      : (Seq[String], Long, DataFrame) = {
    val spark = reread.sparkSession
    val manifest = fileManifest(reread, ranges.map(_._1))
    val total = manifest.count()
    val survivors = ranges.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
    }
    val paths = survivors.select(col("file")).collect().map(_.getString(0)).toSeq
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val df =
      if (paths.isEmpty) reread.filter(lit(false))
      else spark.read.schema(reread.schema).parquet(paths: _*).filter(residual)
    (paths, total, df)
  }

  /** Write `df` clustered by `key` (range-partitioned into `nFiles`
    * shards, sorted inside each) and re-read it. The key column is kept
    * in the files under `keyName` — it is itself a useful coarse filter
    * column, and dropping it after the sort would invite a projection
    * collapse above the sort. Content is a permutation of the input;
    * only the LAYOUT changes — which is exactly what the oracle row
    * gates (parity) and LayoutSpec measures (row-group skipping).
    */
  def writeClustered(df: DataFrame, path: String, key: Column,
                     nFiles: Int, keyName: String = "cluster_key"): DataFrame = {
    val spark = df.sparkSession
    df.withColumn(keyName, key)
      .repartitionByRange(nFiles, col(keyName))
      .sortWithinPartitions(keyName)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
