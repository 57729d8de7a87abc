package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing — the audit step between two versions of a corpus
  * (yesterday's crawl vs today's, pre- vs post-cleaning): which ids were
  * added, which disappeared, which changed content, which are untouched.
  * Every serious dataset-versioning workflow (crawl refreshes, cleaning
  * re-runs, license takedown passes) reads exactly this table before
  * shipping.
  *
  * Shape: ONE full-outer equi-join on the id — both sides shuffle once
  * on the same key, which is the irreducible cost of the semantics.
  * Content equality is decided on xxhash64(content) so the shuffle rows
  * carry an 8-byte digest instead of the document (the hashed-key
  * discipline; a 64-bit collision would misreport one changed doc as
  * unchanged — the text-equality DuckDB oracle would catch it at the
  * gate SFs).
  */
object SnapshotDiff {

  /** Per-id verdict: (id, status ∈ added|removed|changed|unchanged,
    * n_chars_old, n_chars_new).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"),
      xxhash64(col(contentCol)).as("__oh"),
      length(col(contentCol)).as("n_chars_old"))
    val n = newDf.select(col(idCol).as("__id"),
      xxhash64(col(contentCol)).as("__nh"),
      length(col(contentCol)).as("n_chars_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") === col("__nh"), "unchanged")
          .otherwise("changed").as("status"),
        col("n_chars_old"), col("n_chars_new"))
  }

  /** The roll-up a release gate reads: per-status doc counts and char
    * movement (chars in the new snapshot minus chars in the old, summed
    * per status — 0 for unchanged by construction).
    */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame =
    diff(oldDf, newDf, idCol, contentCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars_new"), lit(0)) -
          coalesce(col("n_chars_old"), lit(0))).as("char_delta"))

  /** Apply a CDC change set onto a base snapshot — the incremental
    * corpus-maintenance sibling of [[diff]] (MERGE INTO semantics over
    * plain DataFrames). `changes` carries (idCol, version LONG,
    * op ∈ upsert|delete, <the base's payload columns>); multiple changes
    * per id resolve to the LAST WRITER = max (version, op, payload) with
    * struct ordering (so on an exact version tie 'upsert' > 'delete'
    * lexicographically, and two same-version upserts with different
    * payloads break the tie on the payload struct itself — fully
    * document-stable, no shuffle-order dependence anywhere).
    * Semantics: winning delete drops the id (present in base or not);
    * winning upsert replaces the payload or inserts the id; untouched
    * base rows pass through.
    *
    * Scale shape: ONE id-keyed max_by aggregate over the changes (tiny
    * vs the base) + ONE full-outer id join — no windows, no driver
    * state; at 100 TB the change side is the small one and AQE
    * broadcast-joins it.
    */
  def applyChangeSet(base: DataFrame, changes: DataFrame, idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty)
    val payload = struct(payloadCols.map(col): _*)
    val winners = changes.groupBy(col(idCol))
      .agg(max_by(struct(col("op").as("op"), payload.as("p")),
        struct(col("version"), col("op"), payload)).as("w"))
      .select(col(idCol), col("w.op").as("__op"), col("w.p").as("__p"))
    base.join(winners, Seq(idCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .select(col(idCol) +: payloadCols.map { c =>
        when(col("__op").isNotNull, col(s"__p.$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
