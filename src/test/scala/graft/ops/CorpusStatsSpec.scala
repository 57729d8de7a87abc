package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[CorpusStats.klBySource]]: hand-computed KL on a tiny corpus,
  * the zero lower bound for an unskewed slice, ordering of drifted vs
  * conforming slices, and partition invariance of the quantized sum.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed KL on a two-source corpus") {
    // src a: tokens x x y (p = 2/3, 1/3); src b: tokens y y y
    // global: x 2/6, y 4/6
    val docs = Seq(("a", "x x y"), ("b", "y y y")).toDF("source", "text")
    val out = CorpusStats.klBySource(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def q(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val pAx = 2.0 / 3; val pAy = 1.0 / 3
    val klA = q(pAx * math.log(pAx / (2.0 / 6))) + q(pAy * math.log(pAy / (4.0 / 6)))
    val klB = q(1.0 * math.log(1.0 / (4.0 / 6)))
    assert(out("a")._1 == 3L && out("a")._2 == 2L)
    assert(math.abs(out("a")._3 - math.rint(klA * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out("b")._3 - math.rint(klB * 1e6) / 1e6) < 1e-9)
  }

  test("a slice matching the global mix has KL ~ 0; drifted slices rank above") {
    val conforming = (0 until 50).map(i => ("conf", "alpha beta gamma delta"))
    val drifted = (0 until 50).map(i => ("drift", "alpha alpha alpha alpha"))
    val docs = (conforming ++ drifted).toDF("source", "text")
    val out = CorpusStats.klBySource(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("drift") > out("conf"))
    assert(out.values.forall(_ >= 0.0), "KL must be non-negative")
  }

  test("quantized sum is partition-invariant") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0 until 200).map { i =>
      (s"s${i % 4}", Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("source", "text")
    val one = CorpusStats.klBySource(docs.repartition(1), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val many = CorpusStats.klBySource(docs.repartition(11), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(one == many)
  }

  test("profileNumeric: hand-computed stats, null accounting, partition invariance") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 20.0), (3.0, null), (2.0, 30.0))
      .toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.profileNumeric(d, Seq("a", "b"))
        .as[(String, Long, Long, Double, Double, Double, Long, Boolean)]
        .collect().toSeq
    val got = run(df)
    assert(got.map(_._1) == Seq("a", "b"), "rows sorted by column name")
    val a = got.head
    // a: 4 non-null, 0 null, min 1, max 3, mean 2.0, 3 distinct
    assert((a._2, a._3, a._4, a._5, a._6, a._7) == ((4L, 0L, 1.0, 3.0, 2.0, 3L)))
    val b = got(1)
    // b: 3 non-null, 1 null, mean (10+20+30)/3 = 20.0, 3 distinct
    assert((b._2, b._3, b._4, b._5, b._6, b._7) == ((3L, 1L, 10.0, 30.0, 20.0, 3L)))
    assert(got.forall(_._8), "HLL++ must be within 5% at tiny cardinality")
    assert(run(df.repartition(7)) == got, "one-pass profile must be partition-invariant")
  }

  test("scaleFeatures: hand-computed z/min-max, nulls stay null, partition invariance") {
    val df = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 5.0), (2L, 2.0, null), (3L, 3.0, 5.0), (4L, 2.0, 5.0))
      .toDF("id", "a", "c")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.scaleFeatures(d, Seq("id"), Seq("a", "c"))
        .orderBy($"id")
        .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
        .collect().toSeq
    val got = run(df)
    // a: mean 2, var (1+4+9+4)/4 - 4 = 0.5, std = sqrt(0.5)
    val std = math.sqrt(0.5)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.map(_._2) == Seq(
      Some(r6(-1 / std)), Some(0.0), Some(r6(1 / std)), Some(0.0)))
    assert(got.map(_._3) == Seq(Some(0.0), Some(0.5), Some(1.0), Some(0.5)))
    // c: null input -> null output; zero variance/range -> all null
    assert(got.map(_._4) == Seq(None, None, None, None))
    assert(got.map(_._5) == Seq(None, None, None, None))
    assert(run(df.repartition(5)) == got, "constants must be partition-invariant")
  }

  test("scaleFeatures: empty frame yields null scaled columns, no NPE") {
    val df = Seq((1L, 1.0)).toDF("id", "a").limit(0)
    val got = CorpusStats.scaleFeatures(df, Seq("id"), Seq("a"))
    assert(got.columns.toSeq == Seq("id", "a_z", "a_mm"))
    assert(got.count() == 0L)
  }

  test("correlationMatrix: exact +1/-1 on linear columns, hand-checked mid pair") {
    // b = 2a (corr +1), c = -a (corr -1); d uncorrelated-ish with a
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 1.0),
      (3.0, 6.0, -3.0, 4.0), (4.0, 8.0, -4.0, 2.0))
      .toDF("a", "b", "c", "d")
    def run(d2: org.apache.spark.sql.DataFrame) =
      CorpusStats.correlationMatrix(d2, Seq("a", "b", "c", "d"))
        .as[(String, String, Double)].collect().toSeq
    val got = run(df)
    val m = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d")),
      "all unordered pairs in declaration order, sorted by name")
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == -1.0)
    assert(m(("b", "c")) == -1.0)
    // hand-computed corr(a, d): n=4, sx=10, sxx=30, sy=12, syy=46, sxy=27
    val expected = {
      val (n, sx, sxx, sy, syy, sxy) = (4.0, 10.0, 30.0, 12.0, 46.0, 27.0)
      val den = math.sqrt(n*sxx - sx*sx) * math.sqrt(n*syy - sy*sy)
      BigDecimal((n*sxy - sx*sy) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(m(("a", "d")) == expected)
    assert(run(df.repartition(5)) == got,
      "DECIMAL co-moments must be partition-invariant")
  }

  test("correlationMatrix drops rows with a null in any profiled column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 4.0), (3.0, null), (4.0, 8.0))
      .toDF("a", "b")
    val got = CorpusStats.correlationMatrix(df, Seq("a", "b"))
      .as[(String, String, Double)].collect()
    assert(got.toSeq == Seq(("a", "b", 1.0)), "complete-case: b=2a on surviving rows")
  }

  test("correlationMatrix: zero surviving rows degrades to corr 0.0, no NPE") {
    // an entirely-null column means na.drop leaves nothing: the decimal
    // sums come back NULL and must read as 0 (den = 0 -> corr 0.0),
    // matching the oracle's CASE WHEN NULL > 0 -> ELSE 0 path
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, null)).toDF("a", "b")
    val got = CorpusStats.correlationMatrix(df, Seq("a", "b"))
      .as[(String, String, Double)].collect()
    assert(got.toSeq == Seq(("a", "b", 0.0)))
  }

  test("zipfFit matches an independent OLS over the same quantized terms") {
    // tokens with counts (16, 8, 4, 2, 1) at ranks (1..5): verify the
    // whole output row against a reference OLS computed independently
    // from the identical quantized ln terms, then sanity-check the
    // power-law reading (strongly negative slope, high r2)
    val words = Seq("a" -> 16, "b" -> 8, "c" -> 4, "d" -> 2, "e" -> 1)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = CorpusStats.zipfFit(docs, "doc_id", "text", 500)
      .as[(Long, Double, Double, Double)].collect().head
    // independent reference OLS over the identical quantized ln terms
    def q(x: Double) = BigDecimal(HashKernels.nanoQuant(x), 9)
    val xs = (1 to 5).map(r => q(math.log(r.toDouble)))
    val ys = words.map(_._2).map(c => q(math.log(c.toDouble)))
    val n = 5.0
    val (sx, sy) = (xs.sum.doubleValue, ys.sum.doubleValue)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.doubleValue
    val sxx = xs.map(a => a * a).sum.doubleValue
    val syy = ys.map(a => a * a).sum.doubleValue
    val denx = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denx
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 5L)
    assert(got._2 == r6(slope))
    assert(got._3 == r6((sy - slope * sx) / n))
    val num = n * sxy - sx * sy
    assert(got._4 == r6(num * num / (denx * (n * syy - sy * sy))))
    // the counts follow ~1/r^1.3ish on this tiny grid; slope must be
    // negative and the fit strong
    assert(got._2 < -0.5 && got._4 > 0.9)
  }

  test("zipfFit: single-token corpus degrades to slope 0, r2 0") {
    val docs = Seq((1L, "solo solo solo")).toDF("doc_id", "text")
    val got = CorpusStats.zipfFit(docs, "doc_id", "text", 10)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == 1L && got._2 == 0.0 && got._4 == 0.0)
    // zero slope => intercept is the mean of ln(count), i.e. ln(3)
    assert(math.abs(got._3 - math.log(3.0)) < 1e-6)
  }

  test("heapsFit matches a naive driver replay of the definition") {
    // random corpus; reference: sort docs by the md5 rank key, replay
    // cumulative token count and cumulative distinct vocabulary, then the
    // same quantized OLS — heapsFit's two-phase cumsums and one-pass sums
    // must land on the identical rounded row
    val rnd = new scala.util.Random(31)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = CorpusStats.heapsFit(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Double, Double, Double)].collect().head

    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = docs
      .map { case (id, t) => (md5hex(id.toString) + "|" + id, t) }
      .sortBy(_._1)
      .map(_._2).map(t => graft.ops.HashKernels.tokensOf(t).toSeq)
      .filter(_.nonEmpty)
    var (nCum, seen) = (0L, scala.collection.mutable.Set.empty[String])
    val points = ordered.map { toks =>
      nCum += toks.length; seen ++= toks; (nCum, seen.size.toLong)
    }
    // mirror the implementation's rounding order exactly: exact integer
    // nano sums -> double -> descale (two roundings, same both engines)
    val xs = points.map(p => BigInt(HashKernels.nanoQuant(math.log(p._1.toDouble))))
    val ys = points.map(p => BigInt(HashKernels.nanoQuant(math.log(p._2.toDouble))))
    val n = points.length.toDouble
    val sx = xs.sum.toDouble / 1e9
    val sy = ys.sum.toDouble / 1e9
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble / 1e18
    val sxx = xs.map(a => a * a).sum.toDouble / 1e18
    val syy = ys.map(a => a * a).sum.toDouble / 1e18
    val denx = n * sxx - sx * sx
    val num = n * sxy - sx * sy
    val slope = num / denx
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == points.length.toLong)
    assert(got._2 == r6(slope))
    assert(got._3 == r6((sy - slope * sx) / n))
    assert(got._4 == r6(num * num / (denx * (n * syy - sy * sy))))
    // vocabulary growth on random draws is sublinear but real
    assert(got._2 > 0.1 && got._2 < 1.0 && got._4 > 0.5)
  }

  test("profileNumeric: an all-null column passes nd_ok (0 exact, 0 sketch)") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, null), (2.0, null)).toDF("a", "b")
    val rows = CorpusStats.profileNumeric(df, Seq("a", "b"))
      .select($"column_name", $"n", $"n_distinct", $"nd_ok")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows("b") == ((0L, 0L, true)), "perfect empty sketch is not a gate failure")
    assert(rows("a") == ((3L, 2L, true)))
  }
}
