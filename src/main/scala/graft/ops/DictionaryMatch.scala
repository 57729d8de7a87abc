package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern literal matching in ONE text pass — Aho–Corasick
  * (CACM '75), the dictionary-matching kernel a decontamination or PII
  * sweep needs once the literal set stops fitting a regex alternation:
  * a compiled alternation of k patterns backtracks per position, while
  * the AC automaton walks each document byte exactly once following
  * goto/fail links (O(n + matches), independent of k).
  *
  * Scale shape: the automaton builds on the DRIVER from the (small)
  * pattern list, ships to executors as a broadcast task binary, and the
  * scan is map-only — no shuffle until the caller aggregates matches.
  * All occurrences are reported, including overlapping ones and
  * patterns that are suffixes of other patterns (dictionary-suffix
  * output links are flattened at build time).
  */
object DictionaryMatch {

  /** Immutable automaton. Transitions are per-node hash maps (the
    * pattern alphabet is sparse); fail links and merged output lists
    * are precomputed in BFS order.
    */
  final class AhoCorasick private (
      gotoMaps: Array[Map[Char, Int]],
      fail: Array[Int],
      outputs: Array[Array[Int]],
      val patterns: Array[String]) extends Serializable {

    /** All matches as (patternIndex, 1-based start offset). */
    def findAll(text: String): Seq[(Int, Int)] = {
      if (text == null || text.isEmpty) return Nil
      val hits = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var s = state
        while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
        state = gotoMaps(s).getOrElse(c, 0)
        val out = outputs(state)
        var j = 0
        while (j < out.length) {
          val p = out(j)
          hits += ((p, i + 2 - patterns(p).length)) // end i (0-based) -> 1-based start
          j += 1
        }
        i += 1
      }
      hits.toSeq
    }
  }

  object AhoCorasick {
    def apply(patterns: Seq[String]): AhoCorasick = {
      require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
        "patterns must be non-empty strings")
      require(patterns.distinct == patterns, s"duplicate patterns: $patterns")
      val pats = patterns.toArray
      val gotoMaps = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
      val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      // trie
      for ((p, pi) <- pats.zipWithIndex) {
        var node = 0
        for (c <- p) {
          gotoMaps(node).get(c) match {
            case Some(next) => node = next
            case None =>
              gotoMaps += Map.empty
              ownOut += Nil
              gotoMaps(node) = gotoMaps(node) + (c -> (gotoMaps.size - 1))
              node = gotoMaps.size - 1
          }
        }
        ownOut(node) = pi :: ownOut(node)
      }
      // fail links + merged outputs, BFS order (parents before children)
      val n = gotoMaps.size
      val fail = new Array[Int](n)
      val outputs = new Array[Array[Int]](n)
      outputs(0) = ownOut(0).toArray
      val queue = scala.collection.mutable.Queue[Int]()
      for ((_, child) <- gotoMaps(0)) {
        fail(child) = 0
        outputs(child) = ownOut(child).toArray
        queue += child
      }
      while (queue.nonEmpty) {
        val node = queue.dequeue()
        for ((c, child) <- gotoMaps(node)) {
          var f = fail(node)
          while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
          fail(child) = if (gotoMaps(f).contains(c) && gotoMaps(f)(c) != child)
            gotoMaps(f)(c) else 0
          outputs(child) = (ownOut(child) ++ outputs(fail(child))).toArray
          queue += child
        }
      }
      new AhoCorasick(gotoMaps.toArray, fail, outputs, pats)
    }
  }

  /** Per-(doc, pattern) match stats: (idCol, pattern, n_hits, first_pos)
    * for patterns with at least one occurrence; overlapping and
    * nested-suffix occurrences all count; first_pos is the 1-based char
    * offset of the earliest start. Map-only.
    */
  def matches(docs: DataFrame, idCol: String, textCol: String,
              patterns: Seq[String]): DataFrame = {
    val ac = AhoCorasick(patterns)
    val pats = ac.patterns
    val matchUdf = udf((text: String) => {
      val byPat = ac.findAll(text).groupBy(_._1)
      pats.indices.flatMap { p =>
        byPat.get(p).map(hs => (pats(p), hs.size.toLong, hs.map(_._2).min))
      }
    }).asNondeterministic() // pin: evaluate once per row, not per projected field
    docs.select(col(idCol), explode(matchUdf(col(textCol))).as("m"))
      .select(col(idCol), col("m._1").as("pattern"),
        col("m._2").as("n_hits"), col("m._3").as("first_pos"))
  }
}
