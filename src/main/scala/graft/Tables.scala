package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP_MICROS with isAdjustedToUTC=false,
      // which Spark 4 decodes as TIMESTAMP_NTZ. Every consumer (date_trunc,
      // unix_micros, to_date, the streaming twin) wants TimestampType, so
      // normalize here, branching on the actual decoded type to stay robust
      // against a driver re-encode (raw int64 nanos, or UTC-adjusted micros).
      // The NTZ→timestamp cast reads the wall-clock in the session timezone:
      // only under UTC are the underlying micros preserved bit-for-bit so
      // that Spark's unix_micros agrees exactly with DuckDB's epoch_us.
      // The pin belongs to SESSION CONSTRUCTION (Verify/Bench/TestSpark all
      // set it); a loader must not mutate shared session state as a side
      // effect of reading one table, so it asserts instead of setting.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "Tables(\"events\") requires spark.sql.session.timeZone=UTC at session " +
          "construction — the NTZ cast is timezone-sensitive and a non-UTC " +
          "session would shift every decoded timestamp")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          // raw int64 nanosecond epoch: integer-truncate to µs (a double
          // division would lose precision on ~1.7e18 ns epochs); DuckDB
          // truncates ns→µs the same way.
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
