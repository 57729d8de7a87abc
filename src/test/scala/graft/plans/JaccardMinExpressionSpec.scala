package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The threshold early-exit jaccard (jaccard_sorted_min) must be
  * indistinguishable from the plain merge PAST the `>= t` filter every
  * call site applies: identical surviving pairs, bit-identical jaccard
  * values. Random sorted-set battery + the double-rounding edge the
  * bound probing exists for.
  */
class JaccardMinExpressionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def randomSets(seed: Int): Seq[(Array[Long], Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    (1 to 300).map { _ =>
      val na = rnd.nextInt(40)
      val nb = rnd.nextInt(40)
      // overlapping universes so some pairs clear high thresholds
      val universe = rnd.nextInt(30) + 5
      def mk(n: Int) =
        Array.fill(n)(rnd.nextInt(universe).toLong).distinct.sorted
      (mk(na), mk(nb))
    }
  }

  test("early-exit kernel == plain kernel past the threshold filter") {
    GraftExtensions.register(spark)
    import spark.implicits._
    for (t <- Seq(0.0, 0.3, 0.7, 0.9, 1.0)) {
      val df = randomSets(42).toDF("a", "b")
      val both = df.select(
        call_function("jaccard_sorted", col("a"), col("b")).as("plain"),
        call_function("jaccard_sorted_min", col("a"), col("b"), lit(t)).as("fast"))
        .collect()
      both.foreach { r =>
        val plain = r.getDouble(0); val fast = r.getDouble(1)
        if (plain >= t)
          assert(fast == plain, s"t=$t: qualifying pair must be exact")
        else
          assert(fast < t, s"t=$t: non-qualifying pair must stay below t")
      }
    }
  }

  test("minQualifyingInter is the exact double-rounded boundary") {
    for {
      na <- Seq(0, 1, 3, 10, 37)
      nb <- Seq(0, 1, 4, 10, 40)
      if na + nb > 0
      t <- Seq(0.0, 0.25, 0.5, 0.7, 0.9, 1.0)
    } {
      val m = JaccardSortedMinLong.minQualifyingInter(na, nb, t)
      val upper = math.min(na, nb)
      def q(k: Int): Double = k.toDouble / (na.toLong + nb - k)
      // every inter below m fails the filter, m itself (when feasible) passes
      (math.max(0, m - 2) until m).foreach(k => assert(q(k) < t))
      if (m <= upper) assert(q(m) >= t)
      else assert((0 to upper).forall(k => q(k) < t))
    }
  }

  test("empty-side behavior matches the plain kernel under every threshold") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L), Array.empty[Long])
    ).toDF("a", "b")
    for (t <- Seq(0.0, 0.5)) {
      val rows = df.select(
        call_function("jaccard_sorted", col("a"), col("b")).as("plain"),
        call_function("jaccard_sorted_min", col("a"), col("b"), lit(t)).as("fast"))
        .collect()
      rows.foreach { r =>
        val plain = r.getDouble(0); val fast = r.getDouble(1)
        if (plain >= t) assert(fast == plain) else assert(fast < t)
      }
    }
  }
}
