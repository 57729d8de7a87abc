package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring deduplication — Lee et al., "Deduplicating Training
  * Data Makes Language Models Better" (arXiv:2107.06499): remove every
  * character that lies inside a substring of length ≥ L occurring more
  * than once in the corpus. The paper builds a corpus-wide suffix array;
  * that structure is fundamentally sequential, so this implementation
  * uses the window-cover identity instead, which is exactly equivalent
  * for the removal semantics and is pure Spark aggregation:
  *
  *   a character sits inside some duplicated substring of length ≥ L
  *   ⟺  it is covered by one of the document's length-L windows whose
  *       exact text occurs ≥ 2 times in the corpus.
  *
  * (⇒ any duplicated S with |S| ≥ L covering the char contains a length-L
  * window covering it, and that window occurs wherever S occurs; ⇐ a
  * duplicated window IS a duplicated substring of length L.)
  *
  * Spark shape (100 TB audit): windows explode map-side (|text| rows per
  * doc — linear, the same volume class as the shingle family); ONE
  * map-side-combined count aggregate finds duplicated windows; one join
  * back flags positions; one doc-keyed aggregate collects flagged
  * positions, and a compiled kernel merges them into maximal spans and
  * rebuilds the cleaned text map-only. No suffix array, nothing
  * super-linear, no window function.
  *
  * Both occurrences of a duplicate are removed (flagging is symmetric —
  * every occurrence of a ≥2-count window is covered). The paper's
  * keep-one-copy policy is a deliberate non-default here: symmetric
  * removal is deterministic under any partitioning and exactly
  * SQL-replayable, which the driver oracle exploits (q_exact_substrings).
  *
  * Like [[Decontaminate]], the shuffle key is the window STRING by
  * default (exact, oracle-auditable); `hashKey = true` runs the scale
  * path — [[HashKernels.windowHashes]] hashes each window in place off
  * one char buffer, so no window string is ever allocated and the
  * shuffle key narrows to 8 bytes — at the documented 64-bit collision
  * trade (a collision could flag a non-duplicated window). The two key
  * disciplines are pinned identical per (doc, pos) by
  * q_substr_hash_agree, and the hashed matrix runs against the
  * string-exact oracle in q_boilerplate_matrix.
  */
object ExactSubstrings {

  /** All length-`L` windows of `text` in position order (index i =
    * 1-based pos i+1) — the compiled form of the
    * `transform(sequence(...), substr)` expression chain, which runs
    * interpreted per element and measured ~3× slower at sf0.1 (the same
    * finding that compiled the decontamination gram kernel in round 6).
    * A codegen'd `explode(sequence) + substr(pos, L)` row-wise variant
    * (no array at all) was ALSO measured and lost: 2.57 s → 3.39 s on
    * q_boilerplate_matrix at sf0.1 — the Generate carries the full text
    * per output row where this kernel shares one char buffer.
    * Positions are UTF-16 code units (Java `substring`); they agree with
    * codepoint positions (Spark `substr`, DuckDB `substring`) for all
    * text without surrogate pairs — supplementary-plane text would need
    * the codepoint-walking variant.
    */
  private[ops] def charWindows(text: String, L: Int): Array[String] = {
    if (text == null || text.length < L) return Array.empty[String]
    val n = text.length - L + 1
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = text.substring(i, i + L); i += 1 }
    out
  }

  private def charWindowsUdf(L: Int) = udf((t: String) => charWindows(t, L))

  /** Flagged window start positions per document: `(idCol, pos)` where
    * the length-`L` window starting at 1-based `pos` occurs ≥ 2 times
    * corpus-wide (all occurrences count, including repeats within one
    * document).
    */
  def duplicatedWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      L: Int,
      hashKey: Boolean = false): DataFrame = {
    require(L >= 2, s"duplicatedWindows: L must be >= 2, got $L")
    // hashed path: windows hash in place off one char buffer
    // (HashKernels.windowHashes) — no window string is ever allocated and
    // the shuffle key is 8 bytes; the string path stays byte-exact for
    // the oracle. Agreement between the two is gated end-to-end by
    // q_substr_hash_agree at the driver's gate SF.
    val windows: Column =
      if (hashKey) graft.ops.HashKernels.windowHashesUdf(L)(col(textCol))
      else charWindowsUdf(L)(col(textCol))
    val exploded = df
      .filter(length(col(textCol)) >= L)
      .select(col(idCol), posexplode(windows).as(Seq("p0", "w")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("w"))
    val dups = exploded.groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("w"))
    exploded.join(dups, Seq("w")).select(col(idCol), col("pos"))
  }

  /** Boilerplate forensics: for every pair of groups (sources, domains,
    * shards) the number of DISTINCT length-`L` windows occurring in
    * both — "which sources share templated text" is the first question
    * after exact-substring dedup reports a high removal rate.
    *
    * Group membership per window is a 64-bit BITMASK: groups map to bit
    * indices (one tiny driver-side distinct — group columns are
    * low-cardinality by construction), and ONE window-keyed `bit_or`
    * aggregate — plain Long hash aggregation, map-side combinable, no
    * set buffers, no self-join — computes each window's group set. A
    * kernel explodes each ≥2-bit mask into ordered pairs (≤ G(G−1)/2
    * rows per window, bounded by the group count, not the corpus) and a
    * tiny pair-keyed count finishes. The collect_set and self-join
    * formulations were both measured 3–6× slower at sf0.1 (object-heavy
    * aggregation buffers / double string shuffle respectively).
    * Output: `(group_a, group_b, n_shared_windows)`, group_a < group_b.
    */
  def sharedWindowMatrix(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      L: Int,
      hashKey: Boolean = false): DataFrame = {
    require(L >= 2, s"sharedWindowMatrix: L must be >= 2, got $L")
    val groups = df.select(col(groupCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted
    require(groups.length <= 64,
      s"sharedWindowMatrix: bitmask path supports <= 64 groups, got ${groups.length}")
    val bitOf = groups.zipWithIndex.map { case (g, i) => g -> (1L << i) }.toMap
    // same kernel split as duplicatedWindows: hashed keys never exist as
    // strings, so the window-keyed shuffle carries longs
    val windows: Column =
      if (hashKey) graft.ops.HashKernels.windowHashesUdf(L)(col(textCol))
      else charWindowsUdf(L)(col(textCol))
    val keyed = df
      .filter(length(col(textCol)) >= L)
      .select(
        element_at(typedLit(bitOf), col(groupCol).cast("string")).as("gb"),
        explode(windows).as("w"))
    val pairsOf = udf((mask: Long) => {
      val idxs = (0 until 64).filter(b => (mask & (1L << b)) != 0)
      for { i <- idxs.indices; j <- (i + 1) until idxs.length }
        yield (groups(idxs(i)), groups(idxs(j)))
    })
    keyed.groupBy(col("w"))
      .agg(expr("bit_or(gb)").as("mask"))
      .filter(bit_count(col("mask")) > 1)
      .select(explode(pairsOf(col("mask"))).as("p"))
      .groupBy(col("p._1").as("group_a"), col("p._2").as("group_b"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  /** Per-document removal result: `(idCol, n_chars, n_dup_chars,
    * n_spans, cleaned_text)`. Flagged windows merge into maximal
    * [pos, pos+L) spans; `cleaned_text` is the concatenation of the
    * uncovered segments. Documents with no duplicated window pass
    * through with zero spans.
    */
  def removeDuplicatedSubstrings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      L: Int,
      hashKey: Boolean = false): DataFrame = {
    val flagged = duplicatedWindows(df, idCol, textCol, L, hashKey)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("poss"))
    val clean = udf((text: String, poss: Seq[Int]) => {
      // merge sorted starts into [s, e) spans of length L each
      var nSpans = 0
      var dupChars = 0
      val sb = new StringBuilder(text.length)
      var cur = 1 // 1-based cursor of the next uncopied char
      var i = 0
      while (i < poss.length) {
        val s = poss(i)
        var e = s + L
        i += 1
        while (i < poss.length && poss(i) <= e) { e = poss(i) + L; i += 1 }
        nSpans += 1
        dupChars += e - s
        if (s > cur) sb.append(text.substring(cur - 1, s - 1))
        cur = e
      }
      if (cur <= text.length) sb.append(text.substring(cur - 1))
      (nSpans, dupChars, sb.toString)
    })
    df.join(flagged, Seq(idCol), "left")
      .select(col(idCol), length(col(textCol)).as("n_chars"),
        when(col("poss").isNull,
          struct(lit(0).as("_1"), lit(0).as("_2"), col(textCol).as("_3")))
          .otherwise(clean(col(textCol), col("poss"))).as("r"))
      .select(col(idCol), col("n_chars"),
        col("r._2").as("n_dup_chars"), col("r._1").as("n_spans"),
        col("r._3").as("cleaned_text"))
  }
}
