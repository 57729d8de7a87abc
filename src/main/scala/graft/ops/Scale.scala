package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew-safe aggregation and co-located (bucketed)
  * joins — the two knobs that matter most when a 100 TB keyspace has hot
  * keys or a join is repeated across a pipeline.
  */
object Scale {

  /** Two-stage salted aggregation for skewed group-by keys: stage 1
    * aggregates on (keys, salt) — spreading a hot key over `saltBuckets`
    * reducers — stage 2 merges the partials on the true keys. Only
    * algebraic aggregates compose this way; `sum`/`count`/`min`/`max` are
    * provided. AQE's skew handling covers joins; group-by skew still needs
    * the salt.
    *
    * @param aggs (outputName, inputCol, op∈{sum,count,min,max})
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, String, String)],
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        partialAgg(aggs.head),
        aggs.tail.map(partialAgg): _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(
        mergeAgg(aggs.head),
        aggs.tail.map(mergeAgg): _*)
  }

  private def partialAgg(a: (String, String, String)): Column = a match {
    case (out, in, "sum")   => sum(col(in)).as(out)
    case (out, _, "count")  => count(lit(1)).as(out)
    case (out, in, "min")   => min(col(in)).as(out)
    case (out, in, "max")   => max(col(in)).as(out)
    case (_, _, op)         => throw new IllegalArgumentException(s"non-algebraic op $op")
  }

  private def mergeAgg(a: (String, String, String)): Column = a match {
    case (out, _, "sum")   => sum(col(out)).as(out)
    case (out, _, "count") => sum(col(out)).as(out)
    case (out, _, "min")   => min(col(out)).as(out)
    case (out, _, "max")   => max(col(out)).as(out)
    case (_, _, op)        => throw new IllegalArgumentException(s"non-algebraic op $op")
  }

  /** Bloom-filter join pruning: build a Bloom filter over the small side's
    * key and filter the big side BEFORE its shuffle — the standard way to
    * cut a fact-table shuffle when the dimension filter is selective but
    * the dimension is too large to broadcast outright. False positives only
    * cost wasted shuffle rows; the subsequent join keeps semantics exact.
    *
    * @param expectedItems small side's expected distinct keys
    * @param fpp           false-positive probability
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bloomBc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bloomBc.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Persist both sides bucketed on the join key so repeated joins read
    * pre-partitioned data with NO exchange (the bucketing contract Spark's
    * built-in catalog honors). Returns the re-read, bucket-aware frames.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): DataFrame = {
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    df.sparkSession.table(table)
  }

  /** Hive-style partitioned parquet layout: one directory per `partCol`
    * value, rows sorted within files by `sortCol` (run-length-friendly
    * encodings, monotone row groups). The `repartition(partCol)` first
    * co-locates each partition value into one task so the layout is
    * one-file-per-value, not tasks×values small files. A reader that
    * filters on `partCol` then scans ONLY the matching directories —
    * pruning happens at file LISTING (`PartitionFilters` in the scan,
    * before any I/O), which at 100 TB is the difference between
    * touching one language's shard and walking the whole corpus.
    * Returns the re-read frame rooted at `path`.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
      sortCol: String): DataFrame = {
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
