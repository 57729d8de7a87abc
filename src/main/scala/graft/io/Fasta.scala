package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA reader/writer (ref: seqtables/core/library_utils.py:164-170
  * open_fasta; fixture shape per FIXTURES.md §1).
  *
  * Distributed-safe record split: read with lineSep='>' so each record is
  * one row regardless of file-partition boundaries (the '>' marker can only
  * begin a record). Multi-line (wrapped) sequences are joined. Scales as a
  * plain text scan — no global ordering needed.
  */
object Fasta {

  /** Output: (read_id, seq). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", ">").text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        substring_index(col("value"), "\n", 1).as("header"),
        // everything after the first newline, newlines removed
        regexp_replace(
          expr("substring(value, instr(value, '\n') + 1)"), "[\r\n]", "")
          .as("seq"))
      .select(
        // header word before first whitespace is the id
        substring_index(col("header"), " ", 1).as("read_id"),
        col("seq"))
      .filter(length(col("seq")) > 0)

  /** Write (read_id, seq) rows as FASTA text. */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat(lit(">"), col("read_id"), lit("\n"), col("seq")).as("value"))
      .write.mode("overwrite").text(path)
}
