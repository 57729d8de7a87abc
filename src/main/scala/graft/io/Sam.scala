package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SAM text reader + read-level filters
  * (ref: seqtables/core/utils/custom_sam_utils.py:228-362 read_sam,
  * :138-225 filter_reads, :17-60 flag helpers).
  *
  * Plain text scan → filter header lines → split on tabs. Optional
  * TAG:TYPE:VALUE fields land in a MAP column (`opt`) instead of the
  * reference's dynamic pandas columns. Chunked iteration in the reference is
  * just partitioning here.
  */
object Sam {

  val StdFields: Seq[String] = Seq(
    "header", "flag", "rname", "pos", "mapq", "cigar",
    "rnext", "pnext", "tlen", "seq", "qual")

  /** Output: 11 standard SAM columns (typed) + `opt MAP<STRING,STRING>`. */
  def read(spark: SparkSession, path: String): DataFrame =
    fromLines(spark.read.text(path))

  /** Parse a DataFrame of raw SAM text lines (column `value`) — the shared
    * backend of [[read]] and the [[AlignerBridge]] pipe output.
    */
  def fromLines(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "\t")
    val std = Seq(
      element_at(parts, 1).as("header"),
      element_at(parts, 2).cast("int").as("flag"),
      element_at(parts, 3).as("rname"),
      element_at(parts, 4).cast("int").as("pos"),
      element_at(parts, 5).cast("int").as("mapq"),
      element_at(parts, 6).as("cigar"),
      element_at(parts, 7).as("rnext"),
      element_at(parts, 8).cast("int").as("pnext"),
      element_at(parts, 9).cast("int").as("tlen"),
      element_at(parts, 10).as("seq"),
      element_at(parts, 11).as("qual"))
    // TAG:TYPE:VALUE → map entries (tag, value); split limited to 3 so the
    // value may itself contain ':'.
    val opt = map_from_entries(
      transform(
        slice(parts, 12, 1000),
        f => struct(
          element_at(split(f, ":", 3), 1).as("key"),
          element_at(split(f, ":", 3), 3).as("value"))))
    lines
      .filter(!col("value").startsWith("@") && length(col("value")) > 0)
      .select(std :+ opt.as("opt"): _*)
  }

  /** P7/F8 flag helpers as Column expressions. */
  def flagBit(flag: Column, bit: Int): Column = (flag.bitwiseAND(lit(bit))) =!= 0

  /** F8 `breakdown_bits` (ref: custom_sam_utils.py:17-38): SAM FLAG → array
    * of set bit indices (0-based), e.g. flag 0x13 → [0, 1, 4].
    * (The Scala `shiftright` only shifts by literals, so the per-element
    * shift goes through the SQL form.)
    */
  def breakdownBits(flagCol: String): Column =
    expr(s"filter(transform(sequence(0, 11), " +
      s"b -> IF((shiftright($flagCol, b) & 1) = 1, b, -1)), x -> x >= 0)")
  /** R1/R2 from the 0x10 reverse-strand bit (custom_sam_utils.py:41-48). */
  def readNum(flag: Column): Column = when(flagBit(flag, 0x10), "R2").otherwise("R1")

  /** P6 `filter_reads`: the SAM-level predicate battery. Returns the input
    * with an `error` column (NULL = good read); split downstream with
    * `error.isNull` and aggregate `groupBy(error).count` for the stats the
    * reference returns as a Counter.
    */
  def classifyReads(
      df: DataFrame,
      phixPrefix: String = "phix",
      disallowedFlagBits: Int = 0,
      dropIndels: Boolean = false): DataFrame = {
    val indelPred =
      if (dropIndels) col("cigar").rlike("[ID]") else lit(false)
    val badFlags =
      if (disallowedFlagBits == 0) lit(false)
      else col("flag").bitwiseAND(lit(disallowedFlagBits)) =!= 0
    df.withColumn("error",
      when(col("rname").isNull || col("rname") === "*" || col("rname") === "",
        "unaligned")
        .when(lower(col("rname")).startsWith(phixPrefix), "phix")
        .when(badFlags, "flag")
        .when(col("cigar").isNull || col("cigar") === "*", "no_cigar")
        .when(indelPred, "indel")
        .when(col("cigar").rlike("[HP=XB]"), "unsupported_cigar_op")
        .otherwise(lit(null)))
      // pos_end = pos + len(seq) − clips − 1 (custom_sam_utils.py:200-210)
      .withColumn("pos_end",
        col("pos") + length(col("seq"))
          - softclip(col("cigar"), "^(\\d+)S") - softclip(col("cigar"), "(\\d+)S$")
          - lit(1))
  }

  /** F6 softclip length via regex; ANSI-safe (empty match → 0). */
  private def softclip(cigar: Column, pattern: String): Column = {
    val m = regexp_extract(cigar, pattern, 1)
    when(m === "", lit(0)).otherwise(m.cast("int"))
  }

  /** Good reads only, sorted by (header, read-number) like the reference. */
  def filterReads(df: DataFrame): DataFrame =
    classifyReads(df).filter(col("error").isNull).drop("error")
      .orderBy(col("header"))
}
