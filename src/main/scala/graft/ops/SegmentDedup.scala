package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level exact deduplication — the CCNet "paragraph dedup" step
  * of a corpus pipeline (CCNet, arXiv:1911.00359 §4.2: hash every
  * paragraph of every document, drop all but the first occurrence of
  * each hash corpus-wide; most boilerplate — headers, navigation,
  * license blocks — repeats at paragraph granularity, not document
  * granularity, so document-level dedup misses it).
  *
  * The segmenter is pluggable: [[lineSegments]] is the literal CCNet
  * paragraph splitter (newline-delimited); [[tokenWindowSegments]] cuts
  * disjoint fixed-size token windows, the right granularity for
  * single-line corpora (and the one the driver queries use — the test
  * tables carry no newlines).
  *
  * Plan shape (100 TB audit): segmentation is a map-only expression
  * chain (split → slice windows → posexplode, all codegen'd built-ins —
  * no UDF). First-occurrence election is ONE hash aggregate keyed by the
  * segment with a `min(struct(id, idx))` payload — partial aggregation
  * collapses within-partition repeats before the shuffle, and the
  * winners ARE the aggregate's output, so no join back is needed.
  * Reassembly is a second aggregate keyed by doc id. The only join is
  * doc-id-keyed accounting (per-doc segment totals vs kept segments),
  * co-partitioned by AQE. Nothing in the pipeline is quadratic and no
  * window function appears (PlanSpec pins this).
  *
  * Keying on the segment STRING keeps the operator exact end to end
  * (and lets the DuckDB oracle replay it verbatim). At 100 TB the
  * shuffle key can be narrowed to `xxhash64(segment)` — the payload
  * still carries the string once per distinct segment per partition —
  * via `hashKey = true`; a 64-bit collision would merge two distinct
  * segments (probability ~n²/2⁶⁵), which is the same documented trade
  * as [[Decontaminate]]'s hashed-gram path.
  */
object SegmentDedup {

  /** Disjoint `window`-token segments of `textCol`, space-rejoined.
    * Tokens = runs of non-whitespace (`\S+` — empty splits filtered so a
    * leading blank never yields an empty token). The trailing segment
    * may be shorter than `window`. Empty/blank text → empty array.
    */
  def tokenWindowSegments(textCol: Column, window: Int): Column = {
    require(window > 0, s"tokenWindowSegments: window must be > 0, got $window")
    val toks = filter(split(textCol, "\\s+"), t => length(t) > lit(0))
    val nseg = ceil(size(toks).cast("double") / window).cast("int")
    when(size(toks) > 0,
      transform(sequence(lit(0), nseg - 1),
        i => array_join(slice(toks, i * window + 1, lit(window)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Newline-delimited paragraphs (the literal CCNet segmenter); blank
    * lines are dropped.
    */
  def lineSegments(textCol: Column): Column =
    filter(split(textCol, "\n"), l => length(trim(l)) > lit(0))

  /** Corpus-wide first-occurrence segment dedup.
    *
    * Returns one row per document that had at least one segment:
    * `(idCol, n_segments, n_kept, text_kept)` where `text_kept` is the
    * document's surviving segments re-joined with a single space in
    * original order (`""` when every segment lost its election). "First
    * occurrence" is by `(id, segment index)` ascending — deterministic
    * and partition-count invariant. A segment repeated *within* one
    * document keeps only its first occurrence too (same election).
    *
    * @param segsCol segmenter expression over the text column, e.g.
    *                [[tokenWindowSegments]] or [[lineSegments]]
    * @param hashKey shuffle on `xxhash64(segment)` instead of the
    *                segment string (100 TB key-narrowing; see class doc)
    */
  def dedupSegments(
      df: DataFrame,
      idCol: String,
      segsCol: Column,
      hashKey: Boolean = false): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(segsCol).as(Seq("idx", "seg")))
    val key = if (hashKey) xxhash64(col("seg")) else col("seg")
    // One aggregate: the min (id, idx) holder of each distinct segment.
    val winners = exploded
      .groupBy(key.as("k"))
      .agg(min(struct(col(idCol), col("idx"), col("seg"))).as("w"))
      .select(col(s"w.$idCol"), col("w.idx"), col("w.seg"))
    val kept = winners
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("seg")))),
            s => s.getField("seg")),
          " ").as("text_kept"))
    val totals = df
      .select(col(idCol), size(segsCol).as("n_segments"))
      .filter(col("n_segments") > 0)
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}
