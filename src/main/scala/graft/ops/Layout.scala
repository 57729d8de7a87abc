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

  /** What [[compactFiles]] did: shard counts and the rewritten-row
    * parity needed to assert the commit was lossless.
    */
  final case class CompactionStats(
      nFilesBefore: Long,
      nSmallRewritten: Long,
      nFilesAfter: Long,
      nRowsRewritten: Long,
      nRowsAfterRewrite: Long) {
    def filesReduced: Boolean = nFilesAfter < nFilesBefore
    def rowsPreserved: Boolean = nRowsRewritten == nRowsAfterRewrite
  }

  /** Manifest-aware small-file compaction — the maintenance op an
    * incremental ingest needs after a few hundred micro-batches (Delta
    * OPTIMIZE / Iceberg rewrite_data_files, over plain parquet): select
    * the part files under `minFileBytes` (optionally only those whose
    * cluster-key box intersects `keyRange` — a manifest probe over just
    * the candidates, so maintenance can be scoped to the hot key range
    * without touching cold files), rewrite them into ~`targetFileBytes`
    * outputs RANGE-PARTITIONED AND SORTED on the cluster key (so the
    * rewritten files keep disjoint key boxes and the manifest stays as
    * prunable as the original clustered write), and commit by moving
    * the rewritten files in before deleting the originals.
    *
    * Scale shape: the listing is bounded by shard count; only the
    * small files are ever read or shuffled (one repartitionByRange of
    * the candidate set — cold large files are untouched); the commit is
    * rename+delete, no data copy. A table-format deployment would make
    * the swap atomic via its manifest commit; over raw parquet the
    * window between move-in and delete shows duplicates to a concurrent
    * lister, so run it like every table format does — as the single
    * writer of the table. Returns the stats needed to assert the
    * rewrite was lossless; callers rebuild the manifest with
    * [[fileManifest]] over the re-read (the same pass every caller
    * already runs to plan scans).
    */
  def compactFiles(
      spark: SparkSession,
      path: String,
      keyName: String,
      minFileBytes: Long,
      targetFileBytes: Long,
      keyRange: Option[(Long, Long)] = None): CompactionStats = {
    require(minFileBytes > 0 && targetFileBytes > 0)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles() = fs.listStatus(dirPath)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    val before = dataFiles()
    val small0 = before.filter(_.getLen < minFileBytes)
    val candidates = keyRange match {
      case None => small0
      case Some((lo, hi)) if small0.nonEmpty =>
        // manifest probe over the candidates only: a file is in scope
        // iff its key box intersects [lo, hi]
        val inScope = fileManifest(
          spark.read.parquet(small0.map(_.getPath.toString).toIndexedSeq: _*),
          Seq(keyName))
          .filter(col(s"max_$keyName") >= lit(lo) && col(s"min_$keyName") <= lit(hi))
          .select(col("file")).collect()
          .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
        small0.filter(st => inScope.contains(st.getPath.getName))
      case _ => small0
    }
    if (candidates.length < 2)
      return CompactionStats(before.length, 0, before.length, 0, 0)
    val smallPaths = candidates.map(_.getPath.toString).toIndexedSeq
    val smalls = spark.read.parquet(smallPaths: _*)
    val nRows = smalls.count()
    val totalBytes = candidates.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.compact-$token")
    smalls.repartitionByRange(nOut, col(keyName))
      .sortWithinPartitions(keyName)
      .write.mode("overwrite").parquet(tmp.toString)
    // commit: move the rewritten files in under fresh names, verify the
    // rewrite row count, then drop the originals + scratch
    val rewritten = fs.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    val moved = rewritten.zipWithIndex.map { case (st, i) =>
      val target = new org.apache.hadoop.fs.Path(
        s"$path/part-compact-$token-$i${suffixOf(st.getPath.getName)}")
      if (!fs.rename(st.getPath, target))
        throw new java.io.IOException(s"compact rename ${st.getPath} -> $target failed")
      target.toString
    }
    val nRowsAfter = spark.read.parquet(moved.toIndexedSeq: _*).count()
    if (nRowsAfter != nRows) {
      // refuse to delete sources on a lossy rewrite — fail loudly with
      // both generations on disk (recoverable), never silently drop rows
      throw new IllegalStateException(
        s"compactFiles: rewrite row count $nRowsAfter != source $nRows; " +
        s"sources left in place, rewrite committed under part-compact-$token-*")
    }
    candidates.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
    CompactionStats(before.length, candidates.length, dataFiles().length,
      nRows, nRowsAfter)
  }

  private def suffixOf(name: String): String = {
    val i = name.indexOf('.')
    if (i < 0) "" else name.substring(i)
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
