package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Sketches]]: the Misra-Gries superset guarantee under
  * adversarial partitioning, trim correctness, and exact equality of the
  * two-pass heavy hitters with a naive full groupBy.
  */
class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("trim subtracts the (k+1)-th largest and keeps at most k entries") {
    val m = Map("a" -> 10L, "b" -> 7L, "c" -> 3L, "d" -> 2L)
    val t = Sketches.trim(m, 2)
    // d = 3 (3rd largest) -> a:7, b:4
    assert(t == Map("a" -> 7L, "b" -> 4L))
    assert(Sketches.trim(m, 4) == m)
  }

  test("MG candidates are a superset of true heavy hitters under adversarial splits") {
    // skewed stream: "hot" is 30% of 1000 weighted occurrences, the rest
    // spread over 200 cold tokens; repartition(1..7) changes merge order
    val rows = (Seq.fill(300)("hot") ++ (0 until 700).map(i => s"cold${i % 200}"))
      .zipWithIndex.map { case (t, i) => (t, 1L, i) }
    for (parts <- Seq(1, 3, 7)) {
      val df = rows.toDF("token", "w", "i").repartition(parts, col("i"))
      val cands = Sketches.mgCandidates(df, "token", "w", 10).toSet
      assert(cands.size <= 10)
      assert(cands.contains("hot"), s"parts=$parts lost a 30% heavy hitter")
    }
  }

  test("heavyHitters equals the naive exact computation") {
    val docs = Seq(
      (1L, "x x x y z"),
      (2L, "x y y q r s"),
      (3L, "x t u v w a b c")).toDF("doc_id", "text")
    val tf = Vocabulary.docTermFrequencies(docs, "doc_id", "text")
    val total = tf.agg(sum($"tf")).as[Long].collect().head
    val naive = tf.groupBy($"token").agg(sum($"tf").as("cnt"))
      .filter($"cnt" * 4 > total)
      .select($"token", $"cnt").as[(String, Long)].collect().toMap
    val got = Sketches.heavyHitters(docs, "doc_id", "text", 4)
      .select($"token", $"cnt").as[(String, Long)].collect()
    assert(got.toMap == naive)
    assert(naive.contains("x")) // 5/19 > 1/4? 5*4=20 > 19 — yes
    // sorted by cnt desc, token asc
    assert(got.sortBy { case (t, c) => (-c, t) }.toSeq == got.toSeq)
  }

  test("heavyHitters on an empty corpus is empty") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    assert(Sketches.heavyHitters(docs, "doc_id", "text", 4).count() == 0)
  }

  test("HLL estimate is within 5% at 10k cardinality and near-exact when tiny") {
    import org.apache.spark.sql.functions._
    val big = (0L until 30000L).map(i => (i % 10000, "g")).toDF("v", "g")
    val e1 = Sketches.hllDistinct(big, Seq("g"), "v")
      .select($"hll_estimate").as[Double].collect().head
    assert(math.abs(e1 / 10000.0 - 1.0) < 0.05, s"estimate $e1 off by >5%")
    // small cardinality -> linear-counting regime, much tighter
    val small = (0L until 500L).map(i => (i % 37, "g")).toDF("v", "g")
    val e2 = Sketches.hllDistinct(small, Seq("g"), "v")
      .select($"hll_estimate").as[Double].collect().head
    assert(math.abs(e2 - 37.0) < 1.0, s"linear counting should be near-exact: $e2")
  }

  test("Count-Min never underestimates and is partition-invariant") {
    // tiny width forces collisions; estimate >= truth must still hold
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(i % 5 + 1)(s"t${i % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val tf = Vocabulary.docTermFrequencies(docs, "doc_id", "text")
    val truth = tf.groupBy($"token").agg(sum($"tf").as("cnt"))
      .as[(String, Long)].collect().toMap
    val probes = truth.keys.toSeq.sorted :+ "never_seen"
    def run(parts: Int): Map[String, (Long, Boolean)] =
      Sketches.countMinProbe(docs.repartition(parts, $"doc_id"), "doc_id",
          "text", probes, depth = 3, width = 16)
        .as[(String, Long, Boolean)].collect()
        .map { case (t, c, ok) => t -> (c, ok) }.toMap
    val one = run(1)
    for ((t, c) <- truth) {
      assert(one(t)._1 == c, s"exact column wrong for $t")
      assert(one(t)._2, s"cm contract violated for $t at width=16")
    }
    assert(one("never_seen")._1 == 0L)
    assert(run(7) == one, "element-wise-add merge must be partition-invariant")
  }

  test("Count-Min estimate is exact when the sketch is collision-free") {
    val docs = Seq((1L, "a a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = Sketches.countMinProbe(docs, "doc_id", "text",
        Seq("a", "b", "c", "d", "zz"), depth = 4, width = 2048)
      .as[(String, Long, Boolean)].collect()
      .map { case (t, c, ok) => t -> (c, ok) }.toMap
    assert(got == Map("a" -> (4L, true), "b" -> (2L, true), "c" -> (1L, true),
      "d" -> (1L, true), "zz" -> (0L, true)))
  }

  test("sourceOverlap: exact Jaccard right, estimate within tol, pairs complete") {
    // s1 and s2 share 2 of 6 distinct tokens (J = 1/3); s3 is disjoint
    val docs = Seq(
      ("s1", "a b c d"), ("s1", "a b"),
      ("s2", "c d e f"), ("s2", "e f"),
      ("s3", "x y z")).toDF("source", "text")
    val got = Sketches.sourceOverlap(docs, "source", "text", k = 512, tol = 0.15)
      .as[(String, String, Double, Boolean)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("s1", "s2"), ("s1", "s3"), ("s2", "s3")), "all unordered pairs, sorted")
    val m = got.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("s1", "s2"))._1 == math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(m(("s1", "s3"))._1 == 0.0)
    assert(got.forall(_._4), s"estimate outside tol: ${got.mkString(", ")}")
  }

  test("sourceOverlap is partition-invariant and duplicate-insensitive") {
    val docs = (0 until 120).map { i =>
      (s"s${i % 3}", s"tok${i % 40} tok${(i * 7) % 40} shared0 shared1")
    }.toDF("source", "text")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double, Boolean)] =
      Sketches.sourceOverlap(df, "source", "text", k = 128)
        .as[(String, String, Double, Boolean)].collect().toSeq
    val base = run(docs.repartition(1))
    assert(run(docs.repartition(11, $"text")) == base,
      "min-merge signature must be partition-invariant")
    assert(run(docs.union(docs).repartition(5)) == base,
      "set semantics: duplicated docs must not move any number")
  }

  test("HLL rollup of slice summaries equals the direct sketch bit-for-bit") {
    val rows = (0L until 4000L).map(i => (i % 701, s"d${i % 9}", "g"))
      .toDF("v", "slice", "g")
    val direct = Sketches.hllDistinct(rows, Seq("g"), "v")
      .select($"hll_estimate").as[Double].collect().head
    // summaries per (g, slice) — 9 register arrays — rolled up to g
    val rolled = Sketches.hllRollup(
      Sketches.hllSummaries(rows, Seq("g", "slice"), "v"), Seq("g"))
      .select($"hll_estimate").as[Double].collect().head
    assert(rolled == direct, "max-merge rollup must equal the one-pass sketch exactly")
    // a DIFFERENT slicing must also agree — associativity, not luck
    val rolled2 = Sketches.hllRollup(
      Sketches.hllSummaries(rows.withColumn("slice", ($"v" % 4).cast("string")),
        Seq("g", "slice"), "v"), Seq("g"))
      .select($"hll_estimate").as[Double].collect().head
    assert(rolled2 == direct)
    // p is derived FROM the stored arrays (persisted format): p=10
    // summaries roll up correctly with no parameter to mis-supply
    val direct10 = Sketches.hllDistinct(rows, Seq("g"), "v", p = 10)
      .select($"hll_estimate").as[Double].collect().head
    val rolled10 = Sketches.hllRollup(
      Sketches.hllSummaries(rows, Seq("g", "slice"), "v", p = 10), Seq("g"))
      .select($"hll_estimate").as[Double].collect().head
    assert(rolled10 == direct10)
    // mixing summaries of different p in one group is a hard error, not
    // a silent prefix merge
    val mixed = Sketches.hllSummaries(rows, Seq("g", "slice"), "v", p = 10)
      .union(Sketches.hllSummaries(rows, Seq("g", "slice"), "v", p = 12))
    val err = intercept[org.apache.spark.SparkException] {
      Sketches.hllRollup(mixed, Seq("g")).collect()
    }
    assert(err.getMessage != null)
  }

  test("HLL is partition-invariant and insensitive to duplication") {
    import org.apache.spark.sql.functions._
    val base = (0L until 2000L).map(i => (i, "g")).toDF("v", "g")
    def run(df: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllDistinct(df, Seq("g"), "v")
        .select($"hll_estimate").as[Double].collect().head
    val a = run(base.repartition(1))
    val b = run(base.repartition(13))
    val c = run(base.union(base).repartition(5)) // duplicates must not move it
    assert(a == b, "register max-merge must be partition-invariant")
    assert(a == c, "duplicates must not change the register state")
  }
}
