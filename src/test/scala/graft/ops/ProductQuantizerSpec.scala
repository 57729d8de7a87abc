package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[ProductQuantizer]]: code validity and determinism, ADC ranking
  * quality on planted near-duplicates (top-1 recall vs brute force), and
  * the compression contract (m codes per vector regardless of dimension).
  */
class ProductQuantizerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def plantedCorpus(nBase: Int, nDup: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    def gauss() = rnd.nextGaussian().toFloat
    val base = Array.fill(nBase)(Array.fill(dim)(gauss()))
    val dups = (0 until nDup).map { i =>
      base(i).map(x => x + 0.03f * gauss()) // ~2 deg perturbation, s >= 0.98
    }
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      dups.zipWithIndex.map { case (v, i) => ((nBase + i).toLong, v) }
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("train/encode: m codes per vector, all in [0, ksub), deterministic") {
    val df = plantedCorpus(100, 0, dim = 32, seed = 5)
    val cb = ProductQuantizer.train(df, "vec_id", "embedding", m = 4, ksub = 16)
    assert(cb.m == 4 && cb.dsub == 8)
    assert(cb.cents.length == 4)
    assert(cb.cents.forall(_.length <= 16))
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 100)
    codes.values.foreach { c =>
      assert(c.length == 4)
      assert(c.forall(x => x >= 0 && x < 16))
    }
    // same training inputs -> identical codebooks and codes (no RNG state)
    val cb2 = ProductQuantizer.train(df, "vec_id", "embedding", m = 4, ksub = 16)
    assert(cb.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq)
  }

  test("near-identical vectors share codes; unrelated ones do not") {
    val df = plantedCorpus(50, 10, dim = 32, seed = 9)
    val cb = ProductQuantizer.train(df, "vec_id", "embedding", m = 8, ksub = 32)
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    // a planted near-duplicate agrees with its base on most subspaces
    val agreement = (0 until 10).map { i =>
      codes(i.toLong).zip(codes((50 + i).toLong)).count { case (a, b) => a == b }
    }
    assert(agreement.sum >= 10 * 6,
      s"near-dups should agree on most of 8 subspace codes, got $agreement")
  }

  test("pqTopK: planted top-1 recall matches brute force, exact sims, no self") {
    val nBase = 200; val nDup = 20
    val df = plantedCorpus(nBase, nDup, dim = 32, seed = 11).cache()
    try {
      val queries = df.filter(col("vec_id") < 10) // bases 0..9 have planted dups
      val got = ProductQuantizer.pqTopK(df, queries, "vec_id", "embedding",
        k = 1, m = 8, ksub = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val top1 = got.map(x => (x._1, x._2)).toMap
      val hits = (0 until 10).count(i => top1.get(i.toLong).contains((nBase + i).toLong))
      assert(hits >= 9, s"only $hits/10 planted top-1 neighbors found via PQ+ADC")
      assert(got.forall(x => x._1 != x._2), "self-matches must be excluded")
      // sims are the exact re-ranked cosines: planted pairs sit >= 0.98
      got.filter(x => top1.get(x._1).contains(x._2) && x._2 >= nBase)
        .foreach(x => assert(x._3 >= 0.98, s"re-ranked sim should be exact: $x"))
    } finally df.unpersist()
  }

  test("train validates its geometry arguments") {
    val df = plantedCorpus(10, 0, dim = 32, seed = 3)
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(df, "vec_id", "embedding", m = 5, ksub = 16) // 5 ∤ 32
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(df, "vec_id", "embedding", m = 4, ksub = 1)
    }
  }
}
