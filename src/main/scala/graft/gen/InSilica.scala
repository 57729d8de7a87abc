package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sequencing-data generators — S9
  * (ref: /root/reference/seqtables/core/utils/insilica_sequences.py:9-305,
  * seqtables/io/scratch_data.py:5-28).
  *
  * All randomness is Spark-native (`rand(seed)` column expressions over
  * `spark.range`), so generation is distributed, reproducible, and scales
  * to arbitrary row counts without driver-side loops — the reference
  * builds numpy arrays in memory instead.
  */
object InSilica {

  /** One random sequence as a driver-side string (test fixtures). */
  def generateSequence(len: Int, chars: String = "ACGT", seed: Long = 42L): String = {
    val rng = new scala.util.Random(seed)
    Array.fill(len)(chars(rng.nextInt(chars.length))).mkString
  }

  /** Error-prone library: n copies of the scaffold, each position mutated
    * independently with probability `errorRate` to a uniform different base
    * (ref: generate_library's error_prone_rate path).
    * Output: (read_id STRING, seq STRING).
    */
  def generateLibrary(
      spark: SparkSession,
      scaffold: String,
      n: Long,
      errorRate: Double,
      chars: String = "ACGT",
      seed: Long = 42L): DataFrame = {
    val charArr = array(chars.map(c => lit(c.toString)): _*)
    val scafArr = array(scaffold.map(c => lit(c.toString)): _*)
    spark.range(n)
      .select(
        concat(lit("read_"), col("id")).as("read_id"),
        concat_ws("",
          transform(scafArr, (c, i) =>
            when(rand(seed) < errorRate,
              // replacement letter: deterministic pick among the others
              element_at(array_remove(charArr, c),
                (pmod(hash(col("id"), i), lit(chars.length - 1)) + 1).cast("int")))
              .otherwise(c))).as("seq"))
  }

  /** Moving-mean quality strings: mean phred follows a*ln(x+1)+b across the
    * read (the reference's log curve, insilica_sequences.py:206-207), with
    * N(0, stdev) noise, clamped to [minQ, maxQ], phred+33 encoded.
    * Output adds `qual` to a (read_id, seq) frame.
    */
  def addQualityScores(
      reads: DataFrame,
      startMean: Double = 35.0,
      endMean: Double = 25.0,
      stdev: Double = 3.0,
      minQ: Int = 2,
      maxQ: Int = 40,
      seed: Long = 7L): DataFrame = {
    val len = length(col("seq"))
    val pos = sequence(lit(1), len)
    // a*ln(x+1)+b fitted through (1, startMean) and (len, endMean)
    reads.withColumn("qual",
      concat_ws("",
        transform(pos, p => {
          val frac = log(p.cast("double") + 1.0) / log(len.cast("double") + 1.0)
          val mean = lit(startMean) + (lit(endMean) - lit(startMean)) * frac
          val q = round(mean + randn(seed) * stdev).cast("int")
          chr(greatest(lit(minQ), least(lit(maxQ), q)) + lit(33))
        })))
  }

  /** Random indels: per read, with probability insRate insert a random base
    * at a random position, with delRate delete one (single-event variant of
    * the reference's randomly_add_indels).
    */
  def randomlyAddIndels(
      reads: DataFrame,
      insRate: Double = 0.1,
      delRate: Double = 0.1,
      chars: String = "ACGT",
      seed: Long = 11L): DataFrame = {
    val len = length(col("seq"))
    val insPos = (pmod(hash(col("read_id"), lit(1)), len) + 1).cast("int")
    val delPos = (pmod(hash(col("read_id"), lit(2)), len) + 1).cast("int")
    val insChar = element_at(array(chars.map(c => lit(c.toString)): _*),
      (pmod(hash(col("read_id"), lit(3)), lit(chars.length)) + 1).cast("int"))
    reads.withColumn("seq",
      when(rand(seed) < insRate,
        concat(col("seq").substr(lit(1), insPos), insChar,
          col("seq").substr(insPos + 1, len)))
        .otherwise(col("seq")))
      .withColumn("seq",
        when(rand(seed + 1) < delRate,
          concat(col("seq").substr(lit(1), delPos - 1),
            col("seq").substr(delPos + 1, len)))
          .otherwise(col("seq")))
  }
}
