package graft.functions

import org.apache.spark.sql.SparkSession

import graft.align.Cigar
import graft.model.{Alphabets, CodonTable}
import graft.ops.HashKernels

/** SQL-facing scalar function surface (SURVEY §2.11): the reference's
  * library functions registered as Spark UDFs so `spark.sql` users (and the
  * DuckDB-oracle harness) can call them by name. No Catalyst `Rule` or
  * `SparkStrategy` is needed — these are pure scalar functions
  * (SURVEY §4.2).
  */
object SeqFunctions {

  /** Register every function on the session; idempotent. */
  def register(spark: SparkSession): Unit = {
    // F1 NT→AA translation (codon table incl. unambiguous N-wildcards)
    spark.udf.register("translate_nt",
      (nt: String, frame: Int) => CodonTable.translate(nt, frame))
    // F2 codon split
    spark.udf.register("get_codons",
      (nt: String) => CodonTable.codons(nt))
    // F3 IUPAC degenerate letters → regex
    spark.udf.register("seq_to_regex",
      (s: String) => Alphabets.seqToRegex(s))
    // F4 NT position → (residue, offset)
    spark.udf.register("nt_pos_to_residue",
      (p: Int, frame: Int) => CodonTable.ntPosToResidue(p, frame))
    // T3 CIGAR breakdown
    spark.udf.register("cigar_ops",
      (c: String) => Cigar.parse(c).map(op => (op.op.toString, op.n)))
    // F6 CIGAR-derived coordinates
    spark.udf.register("cigar_end_pos",
      (pos: Int, seqLen: Int, c: String) => Cigar.endPos(pos, seqLen, c))
    spark.udf.register("n_term_softclip", (c: String) => Cigar.nTerminalSoftclip(c))
    spark.udf.register("c_term_softclip", (c: String) => Cigar.cTerminalSoftclip(c))
    // J1/J3 string hamming (position-wise over the common prefix)
    spark.udf.register("hamming_str", (a: String, b: String) => {
      val n = math.min(a.length, b.length)
      var i = 0; var d = 0
      while (i < n) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
      d
    })
    // dedup-family scalars
    spark.udf.register("simhash64", (t: String) => HashKernels.simhash64(t))
    spark.udf.register("jaccard_shingles", (a: String, b: String, k: Int) =>
      HashKernels.jaccardSorted(
        HashKernels.hashedShingles(a, k), HashKernels.hashedShingles(b, k)))
    // text-pipeline kernels (same compiled paths the operators use, so a
    // SQL user's counts agree with Decontaminate/Vocabulary exactly)
    spark.udf.register("word_ngrams", (t: String, n: Int) =>
      HashKernels.wordNgrams(t, n))
    spark.udf.register("word_ngram_hashes", (t: String, n: Int) =>
      HashKernels.wordNgramHashes(t, n))
    spark.udf.register("term_freqs", (t: String) =>
      graft.ops.Vocabulary.termFreqs(t))
  }
}
