package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DictionaryMatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def findAll(pats: Seq[String], text: String): Set[(String, Int)] =
    DictionaryMatch.AhoCorasick(pats).findAll(text)
      .map { case (p, off) => (pats(p), off) }.toSet

  test("the CACM'75 classic: {he, she, his, hers} over 'ushers'") {
    assert(findAll(Seq("he", "she", "his", "hers"), "ushers") ==
      Set(("she", 2), ("he", 3), ("hers", 3)))
  }

  test("overlapping and self-overlapping occurrences all surface") {
    assert(findAll(Seq("aa"), "aaaa") == Set(("aa", 1), ("aa", 2), ("aa", 3)))
    // nested suffixes at the same end position via output links
    assert(findAll(Seq("scan", "can", "an"), "scan") ==
      Set(("scan", 1), ("can", 2), ("an", 3)))
    assert(findAll(Seq("x"), "") == Set.empty)
  }

  test("matches the naive indexOf reference on random small-alphabet text") {
    val rng = new scala.util.Random(7)
    val pats = Seq("ab", "aba", "bb", "aab", "b")
    for (_ <- 1 to 200) {
      val text = Seq.fill(rng.nextInt(40))("ab" (rng.nextInt(2))).mkString
      val naive = (for {
        p <- pats
        i <- 0 to text.length - p.length
        if text.regionMatches(i, p, 0, p.length)
      } yield (p, i + 1)).toSet
      assert(findAll(pats, text) == naive, s"text=$text")
    }
  }

  test("DataFrame surface: per-(doc, pattern) counts and first offsets") {
    val docs = Seq(
      (1L, "she sells seashells"),
      (2L, "nothing found"),
      (3L, "hershey hers")).toDF("doc_id", "text")
    val got = DictionaryMatch.matches(docs, "doc_id", "text",
      Seq("she", "he", "hers"))
      .as[(Long, String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, "she")) == ((2L, 1)))   // 'she' and 'seaSHElls'
    assert(got((1L, "he")) == ((2L, 2)))
    assert(!got.contains((1L, "hers")))
    assert(!got.keys.exists(_._1 == 2L))
    assert(got((3L, "hers")) == ((2L, 1)))  // 'HERShey' and trailing 'hers'
    assert(got((3L, "he")) == ((3L, 1)))    // HErshey, hersHEy, HErs
    assert(got((3L, "she")) == ((1L, 4)))   // herSHEy
  }
}
