package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * step that turns a cleaned corpus into the subword vocabulary a
  * training run tokenizes with.
  *
  * Scale split: the only corpus-scale work is WORD COUNTING — one
  * map-side-combined aggregate over the documents (the same shuffle
  * shape as [[Vocabulary.vocabulary]]). The merge loop then runs on the
  * collected word-frequency table, which is bounded by the VOCABULARY
  * (plateaus at ~100k-1M distinct words regardless of corpus bytes), so
  * iterating there is driver-side by design — the classic formulation —
  * not a scale compromise. Distributing the merge loop would put ~2k
  * tiny Spark jobs on a ~1M-row table; the aggregate-then-iterate split
  * is how production trainers (subword-nmt, SentencePiece) structure it.
  *
  * Determinism: pair selection breaks frequency ties by lexicographic
  * pair order, so the merge list is a pure function of the word counts.
  */
object BpeTrainer {

  /** One learned merge: adjacent symbols `a`+`b` fuse into `a+b`. */
  final case class Merge(a: String, b: String)

  /** End-of-word marker, appended as its own symbol (Sennrich's `</w>`)
    * so merges can distinguish word-final from word-internal contexts.
    */
  val EndOfWord = "</w>"

  /** Phase 1: (word, freq) over the corpus — the one corpus-scale job. */
  def wordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Vocabulary.docTermFrequencies(docs, idCol, textCol)
      .groupBy(col("token")).agg(sum(col("tf")).as("freq"))
      .withColumnRenamed("token", "word")

  /** Phase 2: learn up to `numMerges` merges from a word-frequency table
    * (driver-side; the table is vocabulary-bounded). Stops early when no
    * pair occurs twice.
    */
  def learnMerges(counts: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Array[(Array[String], Long)] = counts.toArray.map { case (w, f) =>
      (w.map(_.toString).toArray :+ EndOfWord, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var it = 0
    while (it < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.toSeq
      // max by freq, ties -> lexicographically smallest pair (deterministic)
      val (best, bestF) = pairCounts.minBy { case ((a, b), f) => (-f, a, b) }
      if (bestF < 2) return merges.toSeq
      merges += Merge(best._1, best._2)
      val fused = best._1 + best._2
      words = words.map { case (syms, f) =>
        if (syms.length < 2) (syms, f)
        else {
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += fused
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          (out.toArray, f)
        }
      }
      it += 1
    }
    merges.toSeq
  }

  /** Train from a corpus: word-count aggregate, then the merge loop. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): Seq[Merge] = {
    val counts = wordCounts(docs, idCol, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(counts.nonEmpty, "BpeTrainer.train: empty corpus")
    learnMerges(counts, numMerges)
  }

  /** Segment one word with a learned merge list (applied in learned
    * order — the standard greedy application).
    */
  def encodeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    merges.foreach { m =>
      if (syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.a && syms(i + 1) == m.b) {
            out += (m.a + m.b)
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Merge-list applier with a per-executor word→subwords memo: word
    * frequencies are Zipfian, so the greedy merge scan (O(|merges| ×
    * |word|) per call) runs once per DISTINCT word per executor instead
    * of once per occurrence. `@transient lazy` re-materializes the map
    * after deserialization; ConcurrentHashMap because one deserialized
    * closure instance is shared across a JVM's task threads. The size
    * cap keeps a pathological unbounded vocabulary from pinning executor
    * memory — beyond it, rare words just encode uncached.
    */
  private final class CachedEncoder(ms: IndexedSeq[Merge]) extends Serializable {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private val MaxEntries = 1 << 20
    def encode(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) hit
      else {
        val enc = encodeWord(word, ms)
        if (cache.size < MaxEntries) cache.put(word, enc)
        enc
      }
    }
  }

  /** (idCol, n_tokens, n_subwords, subwords) per document — map-only
    * application of a trained merge list (broadcast in the closure,
    * memoized per distinct word).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val enc = new CachedEncoder(merges.toIndexedSeq)
    val f = udf((text: String) => {
      val toks = HashKernels.tokensOf(text)
      val sub = toks.flatMap(enc.encode)
      (toks.length, sub.length, sub)
    })
    docs.select(col(idCol), f(col(textCol)).as("s"))
      .select(col(idCol), col("s._1").as("n_tokens"),
        col("s._2").as("n_subwords"), col("s._3").as("subwords"))
  }
}
