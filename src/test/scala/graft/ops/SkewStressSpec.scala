package graft.ops

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-3 verdict #9: prove the round-2 skew guards UNDER LOAD, not just
  * for exactness. A deliberately skewed corpus (one dominant block / one
  * corpus-wide hot fingerprint) goes through ngramJaccard and
  * sharedSubstringPairs, and a task listener pins the per-task share of
  * the quadratic work. Record counts (not wall-clock) keep the bound
  * deterministic. AQE is disabled inside the test: at 4 shuffle
  * partitions its coalescer would legally merge everything into one task
  * and hide the distribution being asserted (at scale AQE's skew-join
  * split works WITH the grid guard, not against it).
  */
class SkewStressSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Per-stage shuffle-read record counts for the tasks run by `body`. */
  private def taskShuffleReads(body: => Unit): Map[Int, Seq[Long]] = {
    val stages = TrieMap.empty[Int, ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          stages.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
            .synchronized {
              stages(t.stageId) += t.taskMetrics.shuffleReadMetrics.recordsRead
            }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener bus is async: wait for the counts to stop moving
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        val now = stages.values.map(_.length.toLong).sum
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(100); waited += 1
      }
      stages.map { case (k, v) => k -> v.toSeq }.toMap
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def skewedDocs(n: Int) = {
    val rnd = new scala.util.Random(7)
    val template = Array.fill(60)("abcdefghij"(rnd.nextInt(10))).mkString
    (0 until n).map { i =>
      // 60% of docs land in ONE dominant block; unique tail so jaccard<1
      val blk = if (i % 5 < 3) "hot" else s"cold${i % 5}"
      val unique = Array.fill(30)("klmnopqrst"(rnd.nextInt(10))).mkString
      (i.toLong, blk, template + unique + i.toString)
    }.toDF("doc_id", "blk", "text")
  }

  test("grid guard spreads the hot block's quadratic join work across tasks") {
    val docs = skewedDocs(200).cache()
    docs.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // 16 shuffle partitions: with the suite default of 4, the handful of
    // grid cells lands too lumpily for a sharp bound
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    // force the shuffle join: at fixture scale Spark broadcasts the
    // 200-row side and the (blk, lo, hi) exchange being asserted never
    // happens — the 100 TB path is the shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def maxShare(maxBlockRows: Int): (Double, Int) = {
        val byStage = taskShuffleReads {
          Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
            n = 3, threshold = 0.5, maxBlockRows = maxBlockRows).count()
        }
        // the join stage is the one with the largest shuffle-read volume
        val join = byStage.values.maxBy(_.sum)
        (join.max.toDouble / join.sum.toDouble, join.count(_ > 0))
      }
      // unguarded: the hot block (120 of 200 rows, ~93% of the pairs) is
      // one join key — one task reads nearly all of the stage's rows
      val (unguardedShare, _) = maxShare(maxBlockRows = 100000)
      assert(unguardedShare > 0.55,
        f"fixture not skewed enough to prove anything ($unguardedShare%.2f)")
      // guarded: g = ceil(120/10) = 12 → 78 grid cells over 16 partitions
      // — no task may hold more than ~a balanced share of the stage
      val (guardedShare, guardedBusy) = maxShare(maxBlockRows = 10)
      assert(guardedShare < 0.3,
        f"hot-block work still concentrates in one task ($guardedShare%.2f of stage rows)")
      assert(guardedBusy >= 8, s"work spread over only $guardedBusy tasks")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      docs.unpersist()
    }
  }

  test("per-position dist: map-side combine bounds the shuffle under extreme read-count skew") {
    // SURVEY §4.2's flagged pathology: key cardinality = |window| × |alphabet|
    // can be far below both the row count and the cluster's parallelism.
    // For the combinable aggregates (count/sum), partial aggregation IS the
    // salt: each mapper ships at most one partial row per (position, base),
    // so what crosses the wire is #mapPartitions × keys — independent of
    // read count. Prove it with task metrics: 200k long-form rows over a
    // 4-position window must shuffle ≤ partitions × 4×4 records, not 200k.
    val nRows = 200000
    val mapParts = 8
    // range with explicit slices: no input exchange, so the only shuffles
    // the listener sees are the aggregate's (and count()'s tiny one)
    val long = spark.range(0, nRows, 1, mapParts)
      .selectExpr("id as read_id", "cast(id % 4 as int) as position",
        "substring('ACGT', cast(id % 4 as int) + 1, 1) as base")
    val byStage = taskShuffleReads {
      Distributions.seqDist(long).count()
    }
    val shuffled = byStage.values.map(_.sum).sum
    assert(shuffled > 0, "expected a shuffle (final aggregate)")
    assert(shuffled <= mapParts * 4 * 4 + 16,
      s"partial aggregation failed to combine map-side: $shuffled records " +
        s"crossed the wire for $nRows input rows")
  }

  test("hot corpus-wide fingerprint is capped by maxDocFreq, bounding pair volume") {
    // every doc shares the same 200-char template → its winnowed prints
    // appear corpus-wide; with maxDocFreq << N those boilerplate prints
    // are dropped and pair volume stays << C(N,2)
    val rnd = new scala.util.Random(13)
    val template = Array.fill(200)("abcdefghij"(rnd.nextInt(10))).mkString
    val docs = (0 until 120).map { i =>
      val unique = Array.fill(150)(('a' + rnd.nextInt(26)).toChar).mkString
      (i.toLong, template + unique)
    }.toDF("doc_id", "text")
    val pairs = Dedup.sharedSubstringPairs(docs, "doc_id", "text",
      k = 8, window = 12, minShared = 1, maxDocFreq = 10).count()
    // un-capped, the template alone makes all C(120,2) = 7140 pairs
    assert(pairs < 7140 / 4,
      s"boilerplate prune failed: $pairs pairs from a shared template")
  }
}
