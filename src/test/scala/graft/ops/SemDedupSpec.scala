package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[SemDedup]] against a local brute-force cosine oracle:
  * planted-duplicate recall at the paper's ~0.95 operating point, the
  * grid-split guarantee (a mega-cluster larger than `maxCellRows` still
  * yields every within-cluster pair EXACTLY once), and the min-id
  * representative rule of [[SemDedup.dropSemanticDuplicates]]. The driver
  * records rows-only for q_semantic_dedup (cluster geometry is not
  * SQL-expressible), so these tests are the correctness signal.
  */
class SemDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 8

  /** 40 noisy members of 4 well-separated anchor directions (ids 0-39,
    * group = id % 4), plus three planted exact duplicates: 40 and 42 copy
    * vector 3, 41 copies vector 17. Noise is large enough that non-copy
    * cosines sit well below 0.95 and small enough that k-means recovers
    * the anchor clusters.
    */
  private val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { id =>
      val a = (id % 4).toInt
      val v = Array.tabulate(dims) { j =>
        val anchor = if (j == 2 * a || j == 2 * a + 1) 1.0 else 0.0
        (anchor + (rnd.nextDouble() - 0.5) * 0.6).toFloat
      }
      id -> v
    }
    base ++ Seq(40L -> base(3)._2.clone(), 41L -> base(17)._2.clone(),
      42L -> base(3)._2.clone())
  }

  private val plantedPairs =
    Set((3L, 40L), (3L, 42L), (40L, 42L), (17L, 41L))

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var num = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      num += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else num / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All-pairs ground truth with the operator's own rounding rule
    * (round half-up to 6dp, then >= threshold).
    */
  private def bruteForce(threshold: Double): Set[(Long, Long)] = {
    val m = corpus.toMap
    (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      sim = BigDecimal(cosine(m(a), m(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= threshold
    } yield (a, b)).toSet
  }

  private def df = corpus.toDF("vec_id", "embedding")

  test("planted duplicates are recovered at the 0.95 operating point") {
    val got = SemDedup
      .semanticPairs(df, "vec_id", "embedding", threshold = 0.95,
        kCentroids = 4, lloydIters = 3, maxCellRows = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical vectors always share a cell, so every planted pair is found
    assert(plantedPairs.subsetOf(got),
      s"missing planted pairs: ${plantedPairs -- got}")
    // soundness: every reported pair really clears the threshold
    val truth = bruteForce(0.95)
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
  }

  test("grid split: a mega-cluster over maxCellRows finds every pair exactly once") {
    // one cell for all 43 rows, split into g = ceil(43/4) = 11 sub-buckets
    val got = SemDedup
      .semanticPairs(df, "vec_id", "embedding", threshold = 0.7,
        kCentroids = 1, lloydIters = 1, maxCellRows = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size,
      "a pair must meet in exactly one grid task — duplicates mean the " +
        "diagonal rule double-counted")
    // with a single cell, within-cluster == all-pairs: the grid must be lossless
    assert(got.toSet == bruteForce(0.7))
    assert(got.nonEmpty)
  }

  test("grid split result is invariant to maxCellRows") {
    def run(cap: Int): Set[(Long, Long)] = SemDedup
      .semanticPairs(df, "vec_id", "embedding", threshold = 0.7,
        kCentroids = 1, lloydIters = 1, maxCellRows = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run(3) == run(100000))
  }

  test("dropSemanticDuplicates keeps the min-id representative of each group") {
    val survivors = SemDedup
      .dropSemanticDuplicates(df, "vec_id", "embedding", threshold = 0.999,
        kCentroids = 4, lloydIters = 3, maxCellRows = 1000)
      .select("vec_id").as[Long].collect().toSet
    // only the exact copies clear 0.999: groups {3,40,42} and {17,41}
    assert(survivors == (0L until 40L).toSet,
      "reps 3 and 17 stay; copies 40, 41, 42 drop")
  }
}
