package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for content-defined chunking. The corpus-level outputs are
  * oracle-gated (q_cdc_chunks / q_cdc_dedup); these pin the properties
  * that make CDC worth having over fixed-offset chunking.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(texts: String*): Seq[Seq[String]] =
    texts.toDF("text").select(Cdc.chunks(col("text")))
      .as[Seq[String]].collect().toSeq

  private def rand(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    val sb = new StringBuilder
    (1 to n).foreach(_ => sb.append(('a' + r.nextInt(26)).toChar))
    sb.toString
  }

  test("chunks cover the text exactly, in order, never empty") {
    val texts = (1 to 8).map(s => rand(s, 50 + s * 37))
    chunksOf(texts: _*).zip(texts).foreach { case (ch, t) =>
      assert(ch.mkString === t)
      assert(ch.forall(_.nonEmpty))
    }
  }

  test("text shorter than the gram width is a single chunk") {
    assert(chunksOf("tiny", "exactly15chars.") === Seq(Seq("tiny"), Seq("exactly15chars.")))
  }

  test("edit locality: a prepended prefix preserves every chunk after the first cut") {
    // All inner cut positions of T sit at >= w, so their anchoring grams
    // lie wholly inside T and survive any prefix edit — the defining CDC
    // property (fixed-offset chunking would shift every boundary).
    val t = rand(42, 4000)
    val Seq(chT, chPT) = chunksOf(t, "EDITED-PREFIX-" + t)
    assert(chT.size >= 3, s"fixture too short to be meaningful: ${chT.size} chunks")
    assert(chPT.takeRight(chT.size - 1) === chT.tail)
  }

  test("expected chunk length tracks the 1-in-32 anchor probability") {
    val t = rand(7, 20000)
    val Seq(ch) = chunksOf(t)
    val mean = t.length.toDouble / ch.size
    assert(mean > 16 && mean < 80, s"mean chunk length $mean off the ~32 target")
  }

  test("codepoint positions: astral chars chunk identically to their ASCII skeleton") {
    // 𝄞 is 2 UTF-16 chars / 4 UTF-8 bytes but ONE position; the cover
    // invariant must hold and boundary arithmetic must not split a
    // surrogate pair. (Cross-engine parity is gated by q_cdc_unicode.)
    val t = rand(11, 800).flatMap(c => if (c % 7 == 0) s"${c}é𝄞" else s"$c")
    val Seq(ch) = chunksOf(t)
    assert(ch.mkString === t)
    assert(ch.forall(c => !Character.isLowSurrogate(c.charAt(0))),
      "a chunk starts mid-surrogate-pair")
    assert(ch.size >= 2)
  }

  // --- Gear rolling-hash path (q_cdc_gear golden pins carry the
  // corpus-level gate; these pin the per-rule properties, which is the
  // whole gate strategy for a path whose cut points can't be oracle- or
  // md5-compared by construction) ---

  private def gearOf(texts: String*): Seq[Seq[String]] =
    texts.toDF("text").select(Cdc.gearChunks(col("text")))
      .as[Seq[String]].collect().toSeq

  test("gear: chunks cover the text exactly, never empty, and are deterministic") {
    val texts = (1 to 8).map(s => rand(100 + s, 60 + s * 53))
    val once = gearOf(texts: _*)
    once.zip(texts).foreach { case (ch, t) =>
      assert(ch.mkString === t)
      assert(ch.forall(_.nonEmpty))
    }
    assert(gearOf(texts: _*) === once)
  }

  test("gear: byte-size bounds — non-final chunks in [minSize, maxSize+3]") {
    val t = rand(55, 30000)
    val Seq(ch) = gearOf(t)
    assert(ch.size >= 100, s"fixture produced only ${ch.size} chunks")
    val sizes = ch.map(_.getBytes("UTF-8").length)
    assert(sizes.init.forall(_ >= 16), s"undersized chunk: ${sizes.init.min}")
    assert(sizes.forall(_ <= 131), s"oversized chunk: ${sizes.max}")
    // expected length ~ minSize + 2^maskBits = 48 bytes
    val mean = t.length.toDouble / ch.size
    assert(mean > 24 && mean < 96, s"mean chunk length $mean off the ~48 target")
  }

  test("gear: edit locality — chunk streams re-converge after an edit") {
    // h resets at each cut, so once one cut re-aligns after the edit,
    // every later cut is a function of content alone: the two chunk
    // streams must share their entire tail
    val t = rand(77, 8000)
    val Seq(chT, chE) = gearOf(t, t.substring(0, 1000) + "EDIT" + t.substring(1000))
    assert(chT.size >= 20)
    val common = chT.reverse.zip(chE.reverse).takeWhile { case (a, b) => a == b }.size
    assert(common >= chT.size / 2,
      s"only $common of ${chT.size} tail chunks survived a point edit")
    // and the head before the edit is untouched
    val head = chT.zip(chE).takeWhile { case (a, b) => a == b }.size
    assert(head >= 1, "the first chunk (before the edit) should be identical")
  }

  test("gear: multi-byte text never splits a code point; forced cuts snap forward") {
    val t = rand(31, 600).flatMap(c => if (c % 5 == 0) s"${c}é𝄞" else s"$c")
    val Seq(ch) = gearOf(t)
    assert(ch.mkString === t, "cover invariant broke — a code point was split")
    assert(ch.forall(c => !Character.isLowSurrogate(c.charAt(0))),
      "a chunk starts mid-surrogate-pair")
    assert(ch.forall(_.getBytes("UTF-8").length <= 131))
  }

  test("gear: maxSize forces cuts on pathological low-entropy input") {
    // constant bytes never satisfy the hash rule after warmup; only the
    // ceiling chunks them — the degenerate input a real crawl contains
    val t = "a" * 10000
    val Seq(ch) = gearOf(t)
    assert(ch.mkString === t)
    assert(ch.map(_.length).forall(_ <= 131))
    assert(ch.size >= 10000 / 131, s"ceiling not enforced: ${ch.size} chunks")
  }

  test("gear: binary kernel covers raw bytes with the same bounds") {
    val r = new scala.util.Random(9)
    val payload = Array.fill(20000)(r.nextInt(256).toByte)
    val df = Seq(Tuple1(payload)).toDF("b")
    val ch = df.select(Cdc.gearChunks(col("b"))).as[Seq[Array[Byte]]].head()
    assert(ch.map(_.length).sum === payload.length)
    assert(ch.flatten.toSeq === payload.toSeq)
    assert(ch.init.forall(_.length >= 16) && ch.forall(_.length <= 128))
  }

  test("containmentPairs flags a planted quote and only that pair") {
    val base = rand(21, 1500)
    val quote = base.substring(200, 900)
    val df = Seq(
      (1L, base),
      (2L, rand(22, 120) + quote + rand(23, 80)),
      (3L, rand(24, 400))).toDF("doc_id", "text")
    val pairs = Cdc.containmentPairs(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"got $pairs")
    assert(pairs((1L, 2L)) > 0.4, s"700-char quote of a 900-char doc: ${pairs((1L, 2L))}")
  }

  test("containmentPairs hashed scale path equals the string-keyed path") {
    // 20 docs sliding 600-char windows over one 2000-char base: dense,
    // partial, asymmetric overlaps — the shape the detector exists for
    val base = rand(51, 2000)
    val docs = (0 until 20).map(i =>
      (i.toLong, rand(60 + i, 100) + base.substring(i * 50, i * 50 + 600) + rand(80 + i, 60)))
    val df = docs.toDF("doc_id", "text")
    def rows(hashKey: Boolean) =
      Cdc.containmentPairs(df, "doc_id", "text", threshold = 0.05,
        hashKey = hashKey)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val str = rows(hashKey = false)
    assert(str.nonEmpty)
    assert(rows(hashKey = true) === str)
  }

  test("containmentPairs prunes boilerplate chunks above the df cap") {
    // one 200-char block shared by 25 docs: its interior chunks have
    // df = 25 > 20 and must be pruned (pairwise containment through
    // ubiquitous boilerplate is noise); raising the cap re-admits them
    val common = rand(31, 200)
    val docs = (1L to 25L).map(i => (i, rand(100 + i.toInt, 60) + common))
    val df = docs.toDF("doc_id", "text")
    val pruned = Cdc.containmentPairs(df, "doc_id", "text", threshold = 0.3)
    assert(pruned.count() === 0, "df-pruned boilerplate still produced pairs")
    val admitted = Cdc.containmentPairs(df, "doc_id", "text",
      threshold = 0.3, maxChunkDf = 30)
    assert(admitted.count() > 100, "raising the cap should re-admit the clique")
  }

  test("binary kernel: covers arbitrary bytes and finds a planted shared block") {
    // true binary data — high bytes, zeros, no UTF-8 validity at all
    def randBytes(seed: Int, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n); r.nextBytes(b); b
    }
    val shared = randBytes(7, 800)
    val a = randBytes(8, 300) ++ shared ++ randBytes(9, 100)
    val b = randBytes(10, 150) ++ shared
    // cover invariant straight through the kernel
    val arr = graft.plans.CdcChunksExpr.kernelBytes(a, 16, 0x07)
    val cat = (0 until arr.numElements()).flatMap(j => arr.getBinary(j).toSeq)
    assert(cat == a.toSeq)
    // containmentPairs runs unchanged on a BINARY column
    val df = Seq((1L, a), (2L, b), (3L, randBytes(11, 500)))
      .toDF("media_id", "payload")
    val pairs = Cdc.containmentPairs(df, "media_id", "payload",
      threshold = 0.3, hashKey = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"got $pairs")
    assert(pairs((1L, 2L)) > 0.5, s"800 shared of 950 bytes: ${pairs((1L, 2L))}")
  }

  test("chunkDedup aligns a shared block across documents with different surroundings") {
    val shared = rand(99, 600)
    val a = rand(1, 300) + shared + rand(2, 250)
    val b = rand(3, 500) + shared + rand(4, 100)
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val dedup = Cdc.chunkDedup(df, "doc_id", "text")
      .filter(col("n_docs") === 2).collect()
    assert(dedup.nonEmpty, "no chunk of the shared 600-char block aligned")
    val saved = dedup.map(_.getAs[Long]("chars_saved")).sum
    assert(saved > 300, s"only $saved shared chars found of ~600")
  }
}
