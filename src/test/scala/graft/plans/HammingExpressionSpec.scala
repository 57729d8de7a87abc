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

class VectorExpressionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native dot/cosine are bit-identical to the UDF kernels") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(29)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("id", "a", "b")
    val rows = df.select(
      call_function("dot_f", col("a"), col("b")),
      graft.ops.HashKernels.dotUdf(col("a"), col("b")),
      call_function("cosine_f", col("a"), col("b")),
      graft.ops.HashKernels.cosineUdf(col("a"), col("b"))).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot_f != dotUdf (must be bit-identical)")
      assert(r.getDouble(2) == r.getDouble(3), "cosine_f != cosineUdf (must be bit-identical)")
    }
    // zero-vector guard
    val z = Seq((Array.fill(4)(0.0f), Array(1.0f, 0f, 0f, 0f))).toDF("a", "b")
      .select(call_function("cosine_f", col("a"), col("b"))).head()
    assert(z.getDouble(0) == 0.0)
  }

  test("vector expressions stay inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(31)
    val df = (0 until 500).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
      .select(round(call_function("cosine_f", col("v"), col("v")), 4).as("c"))
      .groupBy("c").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty,
      s"cosine_f fell out of codegen:\n${plan.take(600)}")
  }
}

class JaccardExpressionSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native jaccard_sorted is bit-identical to the UDF kernel") {
    GraftExtensions.register(spark)
    val texts = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy cat"),
      ("aaaa", "aaaa"),
      ("", "something"),
      ("", ""))
    val df = texts.toDF("ta", "tb").select(
      graft.ops.HashKernels.hashedShinglesUdf(3)(col("ta")).as("a"),
      graft.ops.HashKernels.hashedShinglesUdf(3)(col("tb")).as("b"))
    val rows = df.select(
      call_function("jaccard_sorted", col("a"), col("b")),
      graft.ops.HashKernels.jaccardUdf(col("a"), col("b"))).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
