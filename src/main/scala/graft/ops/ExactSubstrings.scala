package graft.ops

import org.apache.spark.sql.DataFrame
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
  * default (exact, oracle-auditable); `hashKey = true` narrows it to
  * xxhash64 for wide corpora at the documented 64-bit collision trade
  * (a collision could flag a non-duplicated window).
  */
object ExactSubstrings {

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
    val exploded = df
      .filter(length(col(textCol)) >= L)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), length(col(textCol)) - L + 1),
          i => col(textCol).substr(i, lit(L)))).as(Seq("p0", "w")))
      .select(col(idCol), (col("p0") + 1).as("pos"),
        (if (hashKey) xxhash64(col("w")) else col("w")).as("w"))
    val dups = exploded.groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("w"))
    exploded.join(dups, Seq("w")).select(col(idCol), col("pos"))
  }

  /** Boilerplate forensics: for every pair of groups (sources, domains,
    * shards) the number of DISTINCT length-`L` windows occurring in
    * both — "which sources share templated text" is the first question
    * after exact-substring dedup reports a high removal rate. Two keyed
    * aggregates + one window-keyed self-join of the DISTINCT (group,
    * window) frame; with G groups a window contributes at most G(G−1)/2
    * pair rows, so the join output is bounded by G², not the corpus.
    * Output: `(group_a, group_b, n_shared_windows)`, group_a < group_b.
    */
  def sharedWindowMatrix(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      L: Int,
      hashKey: Boolean = false): DataFrame = {
    require(L >= 2, s"sharedWindowMatrix: L must be >= 2, got $L")
    val exploded = df
      .filter(length(col(textCol)) >= L)
      .select(col(groupCol),
        explode(transform(
          sequence(lit(1), length(col(textCol)) - L + 1),
          i => col(textCol).substr(i, lit(L)))).as("w"))
    val keyed =
      (if (hashKey) exploded.withColumn("w", xxhash64(col("w"))) else exploded)
        .distinct()
    keyed.select(col(groupCol).as("group_a"), col("w"))
      .join(keyed.select(col(groupCol).as("group_b"), col("w")), Seq("w"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
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
