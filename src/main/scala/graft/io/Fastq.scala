package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FASTQ reader/writer (ref: seqtables/io/read_sequences.py:11-59
  * read_fastq — pandas line reader grouping records by line_no % 4 — and
  * write_sequences.py:1-8 seqs_to_fastq).
  *
  * FASTQ has no safe in-record delimiter ('@' can start a quality line), so
  * records are assembled from a global line index: zipWithIndex (order-
  * preserving, one extra job to count partition sizes) then a groupBy on
  * line÷4. This is the same grouping contract as the reference. At extreme
  * scale the right answer is a custom FileFormat that splits on 4-line
  * boundaries; the zipWithIndex path is correct and still fully distributed.
  */
object Fastq {

  /** Output: (read_id, seq, qual). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.sparkContext.textFile(path)
    val indexed = lines.zipWithIndex()
    val rows = indexed.map { case (line, idx) => Row(idx / 4, idx % 4, line) }
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("rec", LongType), StructField("part", LongType),
      StructField("line", StringType))))
    df.groupBy(col("rec"))
      .pivot(col("part"), Seq(0L, 1L, 2L, 3L))
      .agg(first(col("line")))
      .select(
        // strip leading '@', id = first whitespace-delimited token
        substring_index(regexp_replace(col("0"), "^@", ""), " ", 1).as("read_id"),
        col("1").as("seq"),
        col("3").as("qual"))
  }

  /** S7 `seqs_to_fastq`: write (read_id, seq, qual) rows as FASTQ text. */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat(
      lit("@"), col("read_id"), lit("\n"),
      col("seq"), lit("\n+\n"),
      col("qual")).as("value"))
      .write.mode("overwrite").text(path)
}
