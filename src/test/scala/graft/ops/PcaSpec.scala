package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PcaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1L << 24

  /** tiny deterministic corpus: 40 vectors in R^5 dominated by one
    * direction u, plus small deterministic "noise" in a second one.
    */
  private val U = Array(0.6, 0.0, 0.8, 0.0, 0.0)
  private val V = Array(0.0, 1.0, 0.0, 0.0, 0.0)
  private def vecs: Seq[Seq[Float]] = (0 until 40).map { i =>
    val t = (i - 20) * 0.5
    val n = math.sin(i * 2.39996) * 0.05 // deterministic, zero-ish mean
    (0 until 5).map(j => (t * U(j) + n * V(j) + 0.1).toFloat)
  }
  private def df = vecs.map(Tuple1(_)).toDF("embedding")

  test("momentRows == driver reference fold, any partitioning") {
    val d = 5
    def ref: Map[(Int, Int), Long] = {
      val acc = scala.collection.mutable.Map[(Int, Int), Long]().withDefaultValue(0L)
      acc((-1, -1)) = vecs.size.toLong
      for (v <- vecs) {
        val x = v.map(_.toDouble)
        for (i <- 0 until d) {
          acc((i, -1)) += math.floor(x(i) * S).toLong
          for (j <- i until d)
            acc((i, j)) += math.floor(x(i) * x(j) * S).toLong
        }
      }
      acc.toMap
    }
    for (parts <- Seq(1, 7)) {
      val got = Pca.momentRows(df.repartition(parts), "embedding", d)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      assert(got == ref, s"parts=$parts")
    }
  }

  test("jacobiEigen: exact small case and random-matrix invariants") {
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(v2.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(math.abs(e2(0)(0)) - math.sqrt(0.5)) < 1e-12)

    val rng = new scala.util.Random(42)
    val d = 12
    val m = Array.fill(d, d)(rng.nextGaussian())
    val sym = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    val (values, vectors) = Pca.jacobiEigen(sym)
    // residual ||A v - lambda v||_inf per eigenpair
    for (c <- 0 until d; i <- 0 until d) {
      val av = (0 until d).map(j => sym(i)(j) * vectors(j)(c)).sum
      assert(math.abs(av - values(c) * vectors(i)(c)) < 1e-9, s"pair $c row $i")
    }
    // orthonormal columns
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(i => vectors(i)(a) * vectors(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
    }
    // trace preserved
    assert(math.abs(values.sum - (0 until d).map(i => sym(i)(i)).sum) < 1e-9)
  }

  test("fit recovers the dominant direction; projections carry its variance") {
    val model = Pca.fit(df, "embedding", k = 2, dim = 5)
    assert(model.n == 40 && model.eigenvalues(0) > model.eigenvalues(1))
    val cos = model.components(0).zip(U).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"top component misses u: cos=$cos")
    // pc_1 sample variance == eigenvalue_1 (same /(n-1) estimator)
    val pc1 = Pca.project(df, "embedding", model).select("pc_1").as[Double].collect()
    val mean = pc1.sum / pc1.length
    val varr = pc1.map(p => (p - mean) * (p - mean)).sum / (pc1.length - 1)
    assert(math.abs(varr - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-3)
    // mean-centering folded into the bias: projections are centered
    assert(math.abs(mean) < 1e-6)
  }

  test("fit is bit-deterministic run-over-run and partition-free") {
    val a = Pca.fit(df.repartition(1), "embedding", k = 3, dim = 5)
    val b = Pca.fit(df.repartition(7), "embedding", k = 3, dim = 5)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("spectrum: shares positive, cumulative monotone, full-k sums to ~1") {
    val rows = Pca.spectrum(df, "embedding", k = 5, dim = 5)
      .orderBy("component").collect()
    assert(rows.length == 5)
    // the floor-quantization bias (~0.5/2^24 per moment) can leave the
    // zero-variance noise directions with eigenvalues of either tiny
    // sign, so the monotonicity/positivity tolerances sit above it
    val cums = rows.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-6 })
    assert(math.abs(cums.last - 1.0) < 1e-6)
    assert(rows.map(_.getDouble(2)).forall(_ > -1e-6))
  }
}
