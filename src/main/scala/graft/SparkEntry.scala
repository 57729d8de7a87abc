package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module query maps; every key that is
  * SQL-expressible has a matching DuckDB oracle in `oracleSql` with
  * identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end spine: scan → broadcast join → aggregate → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_local_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query passes through [[graft.queries.GoldenGate]] by name:
    * deterministic non-SQL-expressible queries carry per-sf pinned
    * output hashes there (compute → require → emit, turning the
    * driver's rows-only checks self-verifying); everything else — and
    * every query at an unpinned sf — is untouched.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, f) =>
      name -> ((s: SparkSession, d: String) => graft.queries.GoldenGate(f(s, d), name, d))
    }

  /** The same registry without the gate — the gate materializes pinned
    * outputs (localCheckpoint), so plan-shape inspection (PlanSpec) must
    * look here to see the query's actual physical plan.
    */
  def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.SeqDomain.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.SamDomain.queries ++
      graft.queries.ScaleDomain.queries ++
      graft.queries.Events.queries ++
      graft.queries.Mining.queries ++
      graft.queries.Web.queries ++
      graft.queries.Links.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The trailing [[graft.queries.OracleStash]] entries are DYNAMIC: the
    * BPE/LR queries stash their deterministic learned artifacts at run
    * time, and — because Verify evaluates this def AFTER running the
    * queries — their oracles restate the full application path in
    * DuckDB with the artifact as literals. Absent if those queries did
    * not run in this JVM (the driver then records the rows-only check,
    * exactly as before the promotion).
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.SeqDomain.oracle ++
      graft.queries.Pipeline.oracle ++
      graft.queries.SamDomain.oracle ++
      graft.queries.ScaleDomain.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Mining.oracle ++
      graft.queries.Web.oracle ++
      graft.queries.Links.oracle ++
      graft.queries.OracleStash.dynamicOracles
}
