package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators — A10 `filter_by_count`
  * (ref: numpy_ops.py:374-405) generalized to the dataset-dedup family a
  * large-scale training-data pipeline needs: exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard.
  *
  * Scale notes baked into each shape:
  *  - exact: one hash aggregate on a 64-bit content hash (not the full
  *    text) — the shuffle carries 8-byte keys.
  *  - MinHash/LSH: candidate generation is a self-join on (band, bandHash)
  *    buckets, never an all-pairs product; verification re-checks real
  *    Jaccard only inside buckets.
  *  - SimHash: signature is one 64-bit long per doc; candidates via 4×16-bit
  *    chunk blocking (any near-dup within hamming≤3 shares ≥1 chunk).
  */
object Dedup {

  /** A10 `filter_by_count`: keep rows whose duplicate count on `key`
    * exceeds `cutoff`. Window count — one shuffle on the key.
    */
  def filterByCount(df: DataFrame, key: String, cutoff: Long): DataFrame =
    df.withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(col("__cnt") > cutoff)
      .drop("__cnt")

  /** Exact dedup: keep one representative row per distinct `key` value
    * (deterministic: the minimum `idCol`). Output adds `dup_count`.
    */
  def exact(df: DataFrame, key: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(key)), col(key))
    df.withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(w.orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct k-char shingles via array slice (codegen'd, no UDF). */
  def shinglesOf(text: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - lit(k) + lit(1), lit(1))),
        i => array_join(slice(split(text, ""), i, lit(k)), "")))

  /** MinHash signature (numHashes 64-bit mins) over hashed shingles.
    * h_i(x) = (a_i * xxhash64(x) + b_i) with fixed deterministic seeds;
    * min over the shingle set. All expression-level — whole-stage codegen.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column = {
    val hashes = (0 until numHashes).map { i =>
      val a = lit(2L * i + 1)       // odd multiplier
      val b = lit(0x9E3779B97F4A7C15L + i)
      array_min(transform(shingleArr, s => pmod(a * xxhash64(s) + b, lit(2147483647L))))
    }
    array(hashes: _*)
  }

  /** MinHash+LSH near-duplicate pairs.
    * shingle→minhash→band→bucket-join→exact-Jaccard verify.
    *
    * @param df        input with (idCol, textCol)
    * @param k         shingle length
    * @param numHashes signature length
    * @param bands     LSH bands (rows per band = numHashes/bands)
    * @param threshold Jaccard threshold for verified pairs
    * Output: (id_a, id_b, jaccard DOUBLE), id_a < id_b.
    */
  def minhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shinglesOf(col(textCol), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(col("sig"), b * rows + 1, lit(rows)), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sign of the sum of
    * ±1 contributions from each token's xxhash64. Expression-only.
    */
  def simhash(text: Column): Column = {
    val tokens = split(trim(text), "\\s+")
    val bitCols = (0 until 64).map { bit =>
      val votes = aggregate(
        tokens,
        lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), bit).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** SimHash near-duplicate pairs with ≤ maxHamming differing bits.
    * Blocking on 4 16-bit chunks guarantees recall for maxHamming ≤ 3.
    * Output: (id_a, id_b, hamming_bits INT).
    */
  def simhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = withSig.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming_bits", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming_bits") <= maxHamming)
      .select("id_a", "id_b", "hamming_bits")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs produced by a
    * blocking key (never all-pairs). Output: (id_a, id_b, jaccard).
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 3,
      threshold: Double = 0.0): DataFrame = {
    val withSh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shinglesOf(col(textCol), n).as("sh"))
    val a = withSh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
