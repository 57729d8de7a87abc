package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: keeps SparkEntry aligned with what the
  * harness expects before any round is submitted.
  */
class ContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are stable snake_case identifiers") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("every registered query analyzes against the real testdata schemas") {
    // Round-6 regression guard: a loader-level schema break (events.ts
    // decoding as TIMESTAMP_NTZ) silently dropped 11 queries from the gate
    // because nothing forced analysis of every registered plan. Building
    // the DataFrame + touching queryExecution.analyzed catches any
    // analysis-time failure for every query without executing them.
    val dir = "/root/testdata/sf0.001"
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("events loader normalizes ts across all three parquet encodings") {
    // the round-6 gate lost 11 queries because the loader assumed one
    // specific parquet encoding of ts; pin all three branches against
    // synthetic fixtures: TIMESTAMP_NTZ (what the driver actually
    // writes), raw int64 nanos, and plain TIMESTAMP
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    val us = 1700000000123456L // µs epoch with sub-second precision
    val base = java.nio.file.Files.createTempDirectory("graft_tables_spec").toString

    // branch 1: TIMESTAMP_NTZ
    val ntzDir = s"$base/ntz"
    Seq(Tuple1(us)).toDF("raw")
      .select(timestamp_micros(col("raw")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$ntzDir/events.parquet")
    // branch 2: raw int64 nanoseconds
    val longDir = s"$base/long"
    Seq(Tuple1(us * 1000L + 789L)).toDF("ts") // extra ns must truncate away
      .write.parquet(s"$longDir/events.parquet")
    // branch 3: plain TIMESTAMP (already what consumers want)
    val tsDir = s"$base/ts"
    Seq(Tuple1(us)).toDF("raw")
      .select(timestamp_micros(col("raw")).as("ts"))
      .write.parquet(s"$tsDir/events.parquet")

    for (dir <- Seq(ntzDir, longDir, tsDir)) {
      val df = Tables(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType, s"$dir: wrong type")
      assert(df.select(unix_micros(col("ts"))).as[Long].head() == us,
        s"$dir: µs value not preserved")
    }
  }

  test("oracle SQL never references tables outside the testdata set") {
    val tables = Tables.All.toSet
    val word = "[a-zA-Z_]+".r
    // crude but effective: every FROM/JOIN target must be a known table or
    // a CTE defined in the same statement
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = ("(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*([a-zA-Z_0-9]+)\\s*" +
        "(?:\\([a-zA-Z_0-9, ]*\\))?\\s*AS\\s*(?:MATERIALIZED\\s*)?\\(").r
        .findAllMatchIn(sql).map(_.group(1)).toSet
      val targets = "(?i)(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z_0-9]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = targets -- tables -- ctes.map(_.toLowerCase) -
        "generate_series" - "range" - "read_parquet"
      assert(unknown.isEmpty, s"$name references unknown relations: $unknown")
    }
  }
}
