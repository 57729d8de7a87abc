package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-verifying gate for queries that are deterministic by construction
  * but not SQL-expressible (seeded LSH, iterative training, driver merge
  * loops), so the driver can only record a rows-only check. The query
  * pins the xxhash64 of its own output per scale factor: compute →
  * require → emit. A semantics change — different scores, different
  * merge order, a lost row — breaks the round loudly instead of sliding
  * through as "rows > 0".
  *
  * The row hash folds with BIT_XOR (order-independent, overflow-free
  * under ANSI; every pinned output carries a unique id/pair key so
  * self-cancellation can't occur). SparkEntry applies the gate to EVERY
  * registered query by name: queries without a pinned (name, sf) entry —
  * all oracle-backed queries, and every query at the bench's sf0.1 —
  * pass through untouched, no extra job, no cache.
  *
  * Pin discipline: every constant below was derived from two independent
  * JVM runs (hash equality across runs is the determinism check) and
  * only for outputs whose determinism is by construction — integer set
  * ops, seeded hashes, driver-side seeded loops, quantized-Long sums.
  * Distributed unquantized float aggregation is NOT pinnable (partition
  * merge order moves the bits); nothing below contains one.
  */
object GoldenGate {

  /** query name -> (sf dir basename -> pinned BIT_XOR(xxhash64(row))). */
  private val Pins: Map[String, Map[String, Long]] = Map(
    // quantized-Long gradient training — bit-reproducible scores
    "q_lr_quality" -> Map(
      "sf0.001" -> 593451318610010724L,
      "sf0.01" -> 9062431030121579018L),
    // deterministic BPE merge loop
    "q_bpe_tokenize" -> Map(
      "sf0.001" -> 311557740884800157L,
      "sf0.01" -> 8502358823665122315L))

  /** Gate `df` if (name, sf-of-dir) carries a pin; identity otherwise. */
  def apply(df: DataFrame, name: String, dir: String): DataFrame =
    Pins.get(name) match {
      case None => df
      case Some(golden) => apply(df, name, golden, dir)
    }

  def apply(df: DataFrame, name: String, golden: Map[String, Long], dir: String): DataFrame = {
    val sf = dir.replaceAll("/+$", "").split('/').last
    golden.get(sf) match {
      case None => df
      case Some(g) =>
        // one materialization serves both the hash job and the caller's
        // downstream consumption (Verify's parquet write)
        val pinned = df.localCheckpoint()
        val h = hashOf(pinned)
        require(h == g,
          s"$name: golden output hash mismatch for $sf — got $h, pinned $g. " +
            "The query is deterministic by construction, so this is a real " +
            "semantics change; re-derive the pin only if the change is intended.")
        pinned
    }
  }

  /** BIT_XOR-folded xxhash64 over all columns of every row. */
  def hashOf(df: DataFrame): Long = {
    val out = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)").as("x"))
      .head()
    if (out.isNullAt(0)) 0L else out.getLong(0)
  }
}
