package graft.io

import org.apache.spark.sql.DataFrame

/** S8 external-aligner bridge
  * (ref: external_algn_tools/bowtie_tools.py:24-210 bowtie2 wrapper).
  *
  * The reference shells out to a local bowtie2 binary: write FASTQ, run
  * the process, read the SAM file back. The Spark-native shape is
  * `rdd.pipe`: every partition serializes its reads as FASTQ on the
  * aligner's stdin and parses the SAM it emits on stdout — the aligner
  * runs WHERE THE DATA LIVES, one process per partition, no driver
  * funnel and no intermediate files. Any aligner that reads FASTQ from
  * stdin and writes SAM to stdout fits (`bowtie2 -x <index> -U - -S -`,
  * `bwa mem <index> -`, minimap2, …); the binary itself is deliberately
  * not bundled — the index/reference setup stays the deployment's
  * concern, exactly like the reference's `build_reference` step.
  *
  * Downstream is format-uniform: the emitted frame is [[Sam.read]]'s, so
  * `SeqTable.fromSam`, `Sam.classifyReads` (phix filtering — the
  * reference's include_phix/phix_filter flags) and the rest of the
  * library apply unchanged.
  */
object AlignerBridge {

  /** Pipe (read_id, seq, qual) reads through an external aligner command.
    *
    * @param reads   frame with read_id, seq, qual (e.g. [[Fastq.read]])
    * @param command aligner argv; stdin = FASTQ, stdout = SAM
    * @return [[Sam.read]]-shaped frame (header lines dropped by the parser)
    */
  def alignWith(reads: DataFrame, command: Seq[String]): DataFrame = {
    val spark = reads.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // concat_ws silently SKIPS nulls — a null seq/qual would emit a 3-line
    // record and misframe every later record on the aligner's stdin, so
    // fail loudly instead
    val fastq = reads.select(
      when(col("read_id").isNull || col("seq").isNull || col("qual").isNull,
        raise_error(lit("AlignerBridge: null read_id/seq/qual would desync the FASTQ stream")))
        .otherwise(concat_ws("\n",
          concat(lit("@"), col("read_id")), col("seq"), lit("+"), col("qual"))))
      .as[String]
    val samLines = fastq.rdd.pipe(command)
    Sam.fromLines(spark.createDataset(samLines).toDF("value"))
  }

  /** `build_reference` parity (bowtie_tools.py:24-52): materialize the
    * (name, sequence) reference list as a FASTA file for the deployment's
    * `bowtie2-build`-style indexer. Driver-side by design — reference
    * dictionaries are small.
    */
  def writeReferenceFasta(refs: Seq[(String, String)], path: String): String = {
    val text = refs.map { case (n, s) => s">$n\n$s" }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), text)
    path
  }
}
