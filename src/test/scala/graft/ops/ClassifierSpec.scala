package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Classifier]] multinomial Naive Bayes: hand-computed smoothed
  * likelihoods, unseen-token floor, deterministic tie-break, scoring a
  * frame disjoint from training, and partition invariance. The driver
  * oracle replays the full train+score pipeline in SQL (q_nb_lang).
  */
class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val trainDocs = Seq(
    (1L, "spam", "buy pills buy"),
    (2L, "spam", "buy now"),
    (3L, "ham", "meeting notes now")).toDF("doc_id", "label", "text")

  test("hand-computed nll and prediction on a 2-class corpus") {
    // vocab = {buy, pills, now, meeting, notes}, |V| = 5
    // spam: buy=3 pills=1 now=1, total 5, denom 10; ham: total 3, denom 8
    val m = Classifier.trainNaiveBayes(trainDocs, "label", "doc_id", "text")
    assert(m.labels === Array("ham", "spam"))
    val out = Classifier.scoreNaiveBayes(
      Seq((10L, "buy buy now")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    assert(out.getString(1) == "spam")
    assert(out.getInt(2) == 3)
    val expected = -math.log(2.0 / 3) - 2 * math.log(4.0 / 10) - math.log(2.0 / 10)
    assert(math.abs(out.getDouble(3) - expected) < 1e-6)
  }

  test("unseen tokens take the per-label smoothing floor") {
    val m = Classifier.trainNaiveBayes(trainDocs, "label", "doc_id", "text")
    val out = Classifier.scoreNaiveBayes(
      Seq((11L, "zzz zzz")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    // ham floor -ln(1/8) beats spam floor -ln(1/10); prior gap ln(2) < 2*gap
    val hamNll = -math.log(1.0 / 3) - 2 * math.log(1.0 / 8)
    val spamNll = -math.log(2.0 / 3) - 2 * math.log(1.0 / 10)
    assert(out.getString(1) == (if (hamNll <= spamNll) "ham" else "spam"))
    assert(math.abs(out.getDouble(3) - math.min(hamNll, spamNll)) < 1e-6)
  }

  test("exact ties break to the lexicographically smallest label") {
    val sym = Seq(
      (1L, "b", "x y"),
      (2L, "a", "x y")).toDF("doc_id", "label", "text")
    val m = Classifier.trainNaiveBayes(sym, "label", "doc_id", "text")
    val preds = Classifier.scoreNaiveBayes(
      Seq((1L, "x"), (2L, "y x y")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().map(_.getString(1))
    assert(preds.toSeq == Seq("a", "a"))
  }

  test("empty documents are dropped from the scored frame") {
    val m = Classifier.trainNaiveBayes(trainDocs, "label", "doc_id", "text")
    val out = Classifier.scoreNaiveBayes(
      Seq((1L, "buy"), (2L, ""), (3L, "  ")).toDF("doc_id", "text"),
      "doc_id", "text", m)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("self-classification separates the classes and is partition invariant") {
    val docs = (1L to 60L).map { i =>
      val (lab, txt) =
        if (i % 2 == 0) ("de", s"der die und das wort$i ist")
        else ("en", s"the and of to word$i is")
      (i, lab, txt)
    }
    val df1 = docs.toDF("doc_id", "label", "text").repartition(1)
    val df5 = docs.toDF("doc_id", "label", "text").repartition(5)
    val a = Classifier.naiveBayesSelf(df1, "label", "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Classifier.naiveBayesSelf(df5, "label", "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a === b)
    // the shared-stopword structure is learnable: every doc self-classifies
    val withTruth = a.map(r => (r.getLong(0), r.getString(1)))
    withTruth.foreach { case (id, pred) =>
      assert(pred == (if (id % 2 == 0) "de" else "en"), s"doc $id")
    }
  }

  test("trainLogistic: one GD step matches the closed-form hand computation") {
    // dim 4, two docs, disjoint single-token texts -> separate buckets
    // (murmur buckets of "aa" and "bb" under dim=4 may collide; use the
    // computed buckets so the reference adapts)
    val docs = Seq((1, "aa"), (0, "bb")).toDF("y", "text")
    val m = Classifier.trainLogistic(docs, "y", "text", dim = 4, iters = 1, lr = 1.0)
    val bA = Classifier.hashFeatures("aa", 4).head._1
    val bB = Classifier.hashFeatures("bb", 4).head._1
    // with w=0,b=0: sigma(0)=0.5 -> residuals -0.5 (y=1) and +0.5 (y=0)
    // grad: bucket(aa) = -0.5, bucket(bb) = +0.5, bias = 0
    // step lr=1, n=2: w(aa) = +0.25, w(bb) = -0.25, bias = 0
    if (bA != bB) {
      assert(m.weightNanos(bA) == 250000000L)
      assert(m.weightNanos(bB) == -250000000L)
      assert(m.biasNano == 0L)
    } else {
      // collision: both residuals hit one bucket and cancel exactly
      assert(m.weightNanos(bA) == 0L)
    }
  }

  test("trainLogistic learns a lexical rule; scoring separates and is invariant") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0 until 120).map { i =>
      val base = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val y = i % 3 == 0
      (i.toLong, if (y) base + " marker" else base, if (y) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "y", "text", dim = 64, iters = 60, lr = 1.0)
    val scored = Classifier.scoreLogistic(docs, "doc_id", "text", m)
      .join(docs.select($"doc_id", $"y"), "doc_id")
      .select($"y", $"quality_score", $"pred").collect()
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(pos.min > neg.max, "positive scores must fully separate negatives")
    assert(scored.forall(r => r.getInt(2) == r.getInt(0)), "perfect preds expected")

    // bit-identical model under different partitioning (quantized sums)
    val m7 = Classifier.trainLogistic(
      docs.repartition(7, $"doc_id"), "y", "text", dim = 64, iters = 60, lr = 1.0)
    assert(m7.biasNano == m.biasNano)
    assert(m7.weightNanos.toSeq == m.weightNanos.toSeq)
  }

  test("scoreLogistic: empty text scores at the bias alone") {
    val m = Classifier.LogisticModel(8, 693147181L, new Array[Long](8)) // ln(2)
    val out = Classifier.scoreLogistic(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text", m)
      .select("quality_score").collect().head.getDouble(0)
    // sigma(0.693147181) = 2/(1+2) ~ 0.666667
    assert(math.abs(out - 0.666667) < 1e-6)
  }
}
