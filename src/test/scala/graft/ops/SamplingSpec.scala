package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Sampling]]: the 128-bit hexThreshold cut, md5-exact Bernoulli
  * membership, quota ranks equal to md5 order, the shuffle-position
  * permutation (and its partition-count invariance — the property that
  * makes the sample a pure function of the data), and mixture weights.
  * The driver oracle re-checks all four on the documents table.
  */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def rankKey(id: Long): String = md5hex(id.toString) + "|" + id

  test("hexThreshold: exact edge cuts and monotonicity") {
    assert(Sampling.hexThreshold(0.0) == "0" * 32)
    assert(Sampling.hexThreshold(1.0) == "g") // sorts after every hex digest
    assert(Sampling.hexThreshold(0.5) == "8" + "0" * 31)
    assert(Sampling.hexThreshold(0.25) == "4" + "0" * 31)
    assert(Sampling.hexThreshold(1e-40) == "0" * 32) // floors, never negative
    val fs = Seq(0.0, 1e-9, 0.1, 0.25, 0.5, 0.75, 0.999, 1.0)
    val ts = fs.map(Sampling.hexThreshold)
    assert(ts == ts.sorted, s"thresholds must be monotone in fraction: $ts")
  }

  test("hashSample: all at 1.0, none at 0.0, md5-exact membership between") {
    val df = (0L until 200L).toDF("id")
    assert(Sampling.hashSample(df, "id", 1.0).count() == 200)
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
    val got = Sampling.hashSample(df, "id", 0.25)
      .select("id").as[Long].collect().toSet
    val cut = Sampling.hexThreshold(0.25)
    val want = (0L until 200L).filter(i => md5hex(i.toString) < cut).toSet
    assert(got == want)
    // sanity: the 25% cut lands in a plausible band, not degenerate
    assert(got.size > 20 && got.size < 80, s"got ${got.size} of 200")
  }

  test("hashSample rejects fractions outside [0, 1]") {
    val df = (0L until 5L).toDF("id")
    intercept[IllegalArgumentException] { Sampling.hashSample(df, "id", -0.1) }
    intercept[IllegalArgumentException] { Sampling.hashSample(df, "id", 1.1) }
  }

  test("quotaSample: rank IS the md5 order, capped at the quota") {
    val rows = (0L until 60L).map { i =>
      (Seq("en", "de", "fr")((i % 3).toInt), i)
    }
    val got = Sampling.quotaSample(rows.toDF("lang", "id"), "lang", "id", 5)
      .as[(String, Long, Int)].collect()
    val byLang = got.groupBy(_._1)
      .view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val want = rows.groupBy(_._1)
      .view.mapValues(_.map(_._2).sortBy(rankKey).take(5).toSeq).toMap
    assert(byLang == want)
    // ranks are 1..quota with no gaps
    assert(got.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == (1 to 5)))
  }

  test("quotaSample with quota >= stratum size keeps every row, still ranked") {
    val rows = (0L until 7L).map(i => ("en", i))
    val got = Sampling.quotaSample(rows.toDF("lang", "id"), "lang", "id", 100)
      .as[(String, Long, Int)].collect().sortBy(_._3).map(_._2).toSeq
    assert(got == (0L until 7L).sortBy(rankKey))
  }

  test("deterministicShuffle: a permutation, invariant to partitioning") {
    val df = (0L until 100L).toDF("id")
    def run(parts: Int): Map[Long, Long] =
      Sampling.deterministicShuffle(df.repartition(parts), "id")
        .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val p1 = run(1)
    assert(run(7) == p1, "shuffle_pos must not depend on partitioning")
    assert(p1.values.toSeq.sorted == (1L to 100L), "positions must be 1..N")
    val want = (0L until 100L).sortBy(rankKey).zipWithIndex
      .map { case (id, ix) => id -> (ix + 1L) }.toMap
    assert(p1 == want, "position must be the md5 rank-key order")
  }

  test("mixtureWeights: shares and target/current re-weighting") {
    val df = Seq(
      ("en", 600L), ("en", 400L), // mass 1000 = 50%
      ("de", 500L), // 25%
      ("pt", 500L) // 25%, absent from targets -> weight 0
    ).toDF("lang", "n_chars")
    val got = Sampling
      .mixtureWeights(df, "lang", "n_chars",
        Map("en" -> 0.5, "de" -> 0.5))
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 2L, 1000L, 0.5, 0.5, 1.0)))
    assert(got("de") == (("de", 1L, 500L, 0.25, 0.5, 2.0))) // up-sample 2x
    assert(got("pt") == (("pt", 1L, 500L, 0.25, 0.0, 0.0))) // not targeted
  }

  test("mixtureWeights rejects a non-integral mass column") {
    val df = Seq(("en", 1.5)).toDF("lang", "mass")
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(df, "lang", "mass", Map("en" -> 1.0))
    }
  }

  test("hashSplit: every row assigned, md5-exact boundaries, subset-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = (0L until 500L).toDF("id")
    val got = Sampling.hashSplit(df, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 500)
    // exact membership: the digest decides, thresholds cumulative
    val c1 = Sampling.hexThreshold(0.8)
    val c2 = Sampling.hexThreshold(0.9)
    got.foreach { case (id, split) =>
      val d = md5hex(id.toString)
      val want = if (d < c1) "train" else if (d < c2) "val" else "test"
      assert(split == want, s"id $id digest $d: got $split want $want")
    }
    // subset stability: assignment of a row never depends on other rows
    val sub = Sampling.hashSplit(df.filter($"id" % 7 === 0), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, split) => assert(got(id) == split) }
    // roughly the requested proportions (md5 is uniform)
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 350 && n("val") > 20 && n("test") > 20, n.toString)
  }

  test("hashSplit oracle CASE mirrors the Spark assignment thresholds") {
    val splits = Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val sql = Sampling.hashSplitOracleCase("id", splits)
    assert(sql.contains(Sampling.hexThreshold(0.5)))
    assert(sql.contains(Sampling.hexThreshold(0.75)))
    assert(sql.endsWith("ELSE 'c' END"))
  }

  test("leakageSafeSplit: near-dup pairs land together, singletons match hashSplit") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (0L until 100L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // a chain component {1,2,3}, a pair {40,77}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (40L, 77L)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(docs, "doc_id", pairs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 100)
    // every member of a component shares its split
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(40L) == got(77L))
    // the shared split is the representative's (min id) hashSplit outcome,
    // and singletons are assigned exactly as plain hashSplit would
    val plain = Sampling.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got(3L) == plain(1L))
    assert(got(77L) == plain(40L))
    ((0L until 100L).toSet -- Set(1L, 2L, 3L, 40L, 77L)).foreach { id =>
      assert(got(id) == plain(id), s"singleton $id diverged from hashSplit")
    }
  }

  test("hashSplit rejects bad split specs") {
    val df = (0L until 5L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.8, "b" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.8, "b" -> -0.1))
    }
  }

  test("tokenBudgetSample: greedy md5-order prefix, whole-docs-only, invariant") {
    import org.apache.spark.sql.functions.{col, md5, concat, lit}
    val docs = (1L to 50L).map(i => (i, (i % 7 + 1) * 10)) // 10..70 tokens
    val df = docs.toDF("id", "n_tokens")
    val budget = 800L
    val got = Sampling.tokenBudgetSample(df, "id", "n_tokens", budget)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    // reference: sort by md5 key on the driver, take the greedy prefix
    val ordered = docs.sortBy { case (i, _) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString + "|" + i
    }
    var cum = 0L
    val expect = scala.collection.mutable.Map[Long, Long]()
    for ((i, t) <- ordered) {
      cum += t
      if (cum <= budget) expect(i) = cum
    }
    // greedy prefix semantics: everything after the first overflow is out
    val firstOverflow = ordered.map(_._2).scanLeft(0L)(_ + _).tail
      .indexWhere(_ > budget)
    assert(got == expect.toMap.filter(_._2 <= budget))
    assert(got.size == firstOverflow)
    // partition invariance
    val got7 = Sampling.tokenBudgetSample(
      df.repartition(7), "id", "n_tokens", budget)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got7 == got)
  }

  test("temperatureAllocation: sqrt weights, floor split, budget respected") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid")) ++
      (126 to 129).map(i => (i.toLong, "tiny")))
      .toDF("id", "g")
    val alloc = Sampling.temperatureAllocation(df, "g", 60L)
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    // weights: sqrt(100)=10, sqrt(25)=5, sqrt(4)=2 -> quantized 1e9
    assert(alloc.map(_._3) == Seq(10000000000L, 5000000000L, 2000000000L))
    // targets: floor(60*10/17)=35, floor(60*5/17)=17, floor(60*2/17)=7
    assert(alloc.map(_._4) == Seq(35L, 17L, 7L))
    assert(alloc.map(_._4).sum <= 60L)
    // raw counts: temperature flattens (100/129=78% of mass -> 35/59=59%)
    assert(alloc.head._2 == 100L)
  }

  test("temperatureSample: per-group md5 prefix of exactly target size") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid")))
      .toDF("id", "g")
    val out = Sampling.temperatureSample(df, "g", "id", 40L).collect()
    val byG = out.groupBy(_.getString(0))
    // w: 1e10 and 5e9 -> targets floor(40*2/3)=26, floor(40/3)=13
    assert(byG("big").length == 26 && byG("mid").length == 13)
    // selected ids = first `target` in md5 order, rank contiguous from 1
    val expectBig = (1 to 100).map(_.toLong)
      .sortBy(rankKey).take(26).toSet
    assert(byG("big").map(_.getLong(1)).toSet == expectBig)
    assert(byG("big").map(_.getInt(2)).sorted.toSeq == (1 to 26).toSeq)
    // partition invariance
    val out7 = Sampling.temperatureSample(df.repartition(7), "g", "id", 40L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out7 == out.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("temperatureSample: Long-scale budget keeps whole groups (heap sized by group, not target)") {
    // budget >> Int.MaxValue: targets overflow an Int, but the bounded
    // heap only needs min(target, group size) slots — every group is
    // kept whole instead of wrapping to a garbage quota
    val df = ((1 to 20).map(i => (i.toLong, "a")) ++
      (21 to 30).map(i => (i.toLong, "b"))).toDF("id", "g")
    val out = Sampling.temperatureSample(df, "g", "id", 5_000_000_000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == ((1 to 20).map(i => ("a", i.toLong)) ++
      (21 to 30).map(i => ("b", i.toLong))).toSet)
  }

  private def refEsKey(id: Long, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 48)
    BigDecimal(-math.log(u) / w)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("weightedSample: keys replay from md5 digits; partition-invariant") {
    val df = (1L to 300L).map(i => (i, (i % 9 + 1).toDouble)).toDF("id", "w")
    for (parts <- Seq(1, 7)) {
      val got = Sampling.weightedSample(df.repartition(parts), "id", "w", 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
      assert(got.length == 20)
      got.foreach { case (id, w, key, _) =>
        assert(key == refEsKey(id, w), s"id=$id")
      }
      // ranks follow (key, id) and are 1..20
      assert(got.sortBy(r => (r._3, r._1)).map(_._4).toSeq == (1 to 20))
    }
  }

  test("weightedSample: inclusion probability tracks the weight") {
    // evens carry 200x the weight of odds; a 200-of-2000 sample must be
    // nearly all even (deterministic given the fixed ids, so this is a
    // stable measurement, not a flaky statistical assertion)
    val df = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) 200.0 else 1.0)).toDF("id", "w")
    val sample = Sampling.weightedSample(df, "id", "w", 200)
      .collect().map(_.getLong(0))
    val evens = sample.count(_ % 2 == 0)
    assert(evens >= 190, s"only $evens/200 high-weight rows drawn")
  }
}
