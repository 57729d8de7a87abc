package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — sub-document dedup at chunk
  * granularity, the LBFS/Venti/rsync family of techniques (public
  * knowledge; Muthitacharoen et al., SOSP'01).
  *
  * Fixed-offset chunking breaks under insertion (every later chunk
  * shifts); CDC instead cuts wherever the CONTENT hashes below a
  * threshold, so an edit only disturbs the chunks it touches. Boundary
  * rule: a cut lands after codepoint position `i` when the w-gram
  * ending at `i` satisfies `md5(gram) <= t` for a 2-hex-char prefix
  * threshold `t` — P(cut) = (t+1)/256 per position, so expected chunk
  * length ≈ 256/(t+1). md5 is the anchor hash (not a security choice)
  * because BOTH engines ship it with identical semantics, which keeps
  * the whole family under the cross-engine oracle gate; a production
  * deployment would swap in xxhash64 with the same structure.
  *
  * Implementation is a compiled one-pass kernel (the [[HashKernels]]
  * precedent), NOT nested higher-order array expressions: Spark's
  * array lambdas run interpreted, don't share subexpressions across
  * lambda invocations (the cut list would be re-derived per emitted
  * chunk — quadratic per row), and `UTF8String.substring` is O(n) per
  * window. The kernel walks the text once: O(w·n) hashing per row,
  * byte-slicing windows off a single UTF-8 buffer on the ASCII fast
  * path. Chunking is therefore map-only at scan speed; the only
  * exchange in the family is the chunk-keyed aggregate corpus dedup
  * genuinely requires, and its key can be narrowed to xxhash64(chunk)
  * when shuffle volume matters more than collision-auditability.
  *
  * Positions are Unicode code points (not UTF-16 chars, not bytes) to
  * match `substring` semantics in Spark SQL and DuckDB exactly.
  */
object Cdc {

  /** One-pass chunker: cut after cp position i (w <= i < n) when the
    * first byte of md5(utf8(window)) is <= maxFirstByte; a cut at the
    * final position is dropped (the end sentinel already cuts there).
    * Returns the chunks in order; they concatenate back to `text`.
    */
  private[ops] def chunkKernel(text: String, w: Int, maxFirstByte: Int): Array[String] = {
    if (text == null) return null
    if (text.isEmpty) return Array("")
    val nCp = text.codePointCount(0, text.length)
    if (nCp < w) return Array(text)
    val md = MessageDigest.getInstance("MD5")
    val utf8 = text.getBytes(StandardCharsets.UTF_8)
    val ascii = utf8.length == text.length
    // char offset of each codepoint boundary (identity when ASCII)
    val offs: Array[Int] =
      if (ascii) null
      else {
        val o = new Array[Int](nCp + 1)
        var ci = 0
        var cp = 0
        while (cp < nCp) { o(cp) = ci; ci = text.offsetByCodePoints(ci, 1); cp += 1 }
        o(nCp) = text.length
        o
      }
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var i = w
    while (i <= nCp) {
      md.reset()
      if (ascii) md.update(utf8, i - w, w)
      else md.update(text.substring(offs(i - w), offs(i))
        .getBytes(StandardCharsets.UTF_8))
      if ((md.digest()(0) & 0xff) <= maxFirstByte && i != nCp) cuts += i
      i += 1
    }
    cuts += nCp
    val out = new Array[String](cuts.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) =
        if (ascii) text.substring(cuts(j), cuts(j + 1))
        else text.substring(offs(cuts(j)), offs(cuts(j + 1)))
      j += 1
    }
    out
  }

  /** The chunk list of `text` as a column. `maxHexPrefix` is the
    * 2-hex-char inclusive upper bound on the md5 prefix — "07" accepts
    * 8 of 256 first bytes, i.e. expected chunk length ≈ 32 chars.
    */
  def chunks(text: Column, w: Int = 16, maxHexPrefix: String = "07"): Column = {
    require(w >= 2, s"gram width must be >= 2, got $w")
    require(maxHexPrefix.length == 2,
      s"threshold must be exactly 2 hex chars (one byte), got '$maxHexPrefix'")
    val maxFirstByte = Integer.parseInt(maxHexPrefix, 16)
    udf((t: String) => chunkKernel(t, w, maxFirstByte)).apply(text)
  }

  /** Corpus-level chunk dedup stats: one row per distinct chunk with its
    * occurrence count, distinct-document spread, length, and the chars a
    * chunk-store would save by keeping one copy. ONE hash aggregate
    * keyed on the chunk text.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, maxHexPrefix: String = "07"): DataFrame =
    df.select(col(idCol), explode(chunks(col(textCol), w, maxHexPrefix)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(idCol)).as("n_docs"))
      .select(col("chunk"), length(col("chunk")).as("chunk_len"),
        col("n_occ"), col("n_docs"),
        ((col("n_occ") - 1) * length(col("chunk"))).as("chars_saved"))
}
