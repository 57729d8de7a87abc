package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[BpeTrainer]] against the worked example from Sennrich et al.
  * 2016 (low/lower/newest/widest), the deterministic tie-break, merge
  * application, and the two-phase corpus path.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val paperCounts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the paper example with deterministic ties") {
    val merges = BpeTrainer.learnMerges(paperCounts, 5)
    assert(merges == Seq(
      BpeTrainer.Merge("e", "s"),       // freq 9 (ties with (s,t),(t,</w>) -> lexicographic)
      BpeTrainer.Merge("es", "t"),      // freq 9
      BpeTrainer.Merge("est", "</w>"),  // freq 9
      BpeTrainer.Merge("l", "o"),       // freq 7 (ties with (o,w) -> lexicographic)
      BpeTrainer.Merge("lo", "w")))     // freq 7
  }

  test("encodeWord segments an unseen word with learned merges") {
    val merges = BpeTrainer.learnMerges(paperCounts, 5)
    // 'lowest' was never a training word, but its pieces were
    assert(BpeTrainer.encodeWord("lowest", merges).toSeq ==
      Seq("low", "est</w>"))
    assert(BpeTrainer.encodeWord("low", merges).toSeq ==
      Seq("low", "</w>")) // (low,</w>) was never merged within 5 steps
  }

  test("merge loop stops when no pair repeats; zero merges is valid") {
    assert(BpeTrainer.learnMerges(Seq(("ab", 1L), ("cd", 1L)), 10).isEmpty)
    assert(BpeTrainer.learnMerges(paperCounts, 0).isEmpty)
  }

  test("two-phase corpus training and map-only tokenization") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")
    ).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "doc_id", "text", numMerges = 5)
    assert(merges == BpeTrainer.learnMerges(paperCounts, 5),
      "corpus path must learn the same merges as the count table")
    val got = BpeTrainer.tokenize(docs, "doc_id", "text", merges)
      .as[(Long, Int, Int, Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L)._2 == 6) // 6 words
    assert(got(2L)._4.take(3) == Seq("n", "e", "w")) // newest -> n e w est</w>
    assert(got(2L)._3 == 6 * 4)
    // subword count never exceeds char count + words (the </w> markers)
    got.values.foreach { case (_, nTok, nSub, subs) =>
      assert(nSub == subs.length)
      assert(nSub >= nTok, "every word yields at least one subword")
    }
  }
}
