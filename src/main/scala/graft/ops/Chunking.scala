package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window chunking: split each document into overlapping windows of
  * `window` tokens advancing by `stride` — the standard pre-tokenization
  * step for fixed-context training (stride < window keeps cross-boundary
  * context; [[Packing]] then bins the chunks into context budgets).
  *
  * Map-only: one compiled kernel call per document emits the chunk
  * structs, `posexplode` flattens them. No shuffle anywhere — at 100 TB
  * this is pure scan→generate throughput. Chunk text re-joins the
  * NORMALIZED tokens (lowercased, whitespace-collapsed — the same
  * [[TextAnalysis.tokens]] normalization as the rest of the text family),
  * not raw character offsets.
  *
  * Chunk layout: starts at 0, stride, 2·stride, …; emission STOPS after
  * the first window that reaches the document end (the standard chunker
  * contract, e.g. HF `return_overflowing_tokens`) — continuing would
  * emit trailing chunks fully contained in the previous one, duplicating
  * tail content into the training set. The last chunk may be shorter
  * than `window`. Empty/whitespace-only documents produce no chunks.
  */
object Chunking {

  /** (n_tokens, chunk_text) per window of one document. */
  def chunks(text: String, window: Int, stride: Int): Array[(Int, String)] = {
    val toks = HashKernels.tokensOf(text)
    if (toks.length == 0) return Array.empty[(Int, String)]
    val n = toks.length
    val out = new scala.collection.mutable.ArrayBuffer[(Int, String)]((n + stride - 1) / stride)
    var start = 0
    var reachedEnd = false
    while (!reachedEnd) {
      val end = math.min(start + window, n)
      val sb = new java.lang.StringBuilder((end - start) * 8)
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out += ((end - start, sb.toString))
      reachedEnd = end == n
      start += stride
    }
    out.toArray
  }

  /** Long form (idCol, chunk_idx 0-based, n_tokens, chunk_text). */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val f = udf((t: String) => chunks(t, window, stride))
    df.select(col(idCol), posexplode(f(col(textCol))).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        col("c._1").as("n_tokens"), col("c._2").as("chunk_text"))
  }

  /** Fill-in-the-middle example assembly (Bavarian et al.,
    * arXiv:2207.14255): split each document into (prefix, middle,
    * suffix) at two cut points and emit the PSM permutation
    * `<PRE>prefix<SUF>suffix<MID>middle` — the transformation that
    * teaches causal LMs to infill. The paper cuts uniformly at random;
    * here the cuts derive from id arithmetic (`id mod 97`, `7·id mod
    * 89` scaled by length), so the split is a pure function of the row —
    * deterministic across reruns, engines (the DuckDB oracle replays
    * it), and partitionings, while still varying per document. Character
    * cuts, like the paper's default. Map-only, no shuffle; expression
    * arithmetic only (codegen'd, no UDF).
    *
    * Output: `(idCol, n_prefix, n_middle, n_suffix, psm_text)`.
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col(textCol))
    val c1 = floor(n * (col(idCol) % 97) / lit(97.0)).cast("int")
    val c2 = floor(n * ((col(idCol) * 7) % 89) / lit(89.0)).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.select(col(idCol),
      lo.as("n_prefix"),
      (hi - lo).as("n_middle"),
      (n - hi).as("n_suffix"),
      concat(lit("<PRE>"), col(textCol).substr(lit(1), lo),
        lit("<SUF>"), col(textCol).substr(hi + 1, n - hi),
        lit("<MID>"), col(textCol).substr(lo + 1, hi - lo)).as("psm_text"))
  }
}
