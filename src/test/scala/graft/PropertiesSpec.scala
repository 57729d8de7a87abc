package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.align.{AlignRead, Cigar}
import graft.core.SeqTable
import graft.model.CodonTable
import graft.ops.HashKernels

/** Property-based invariants (SURVEY §5's test-pyramid layer 2), driven by
  * ScalaCheck over generated sequences — pure-kernel properties so they run
  * thousands of cases without Spark jobs.
  */
class PropertiesSpec extends AnyFunSuite {

  /** Run a ScalaCheck property with 200 cases (plain scalacheck — the
    * scalatestplus bridge isn't on the offline classpath).
    */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val dnaGen: Gen[String] =
    Gen.chooseNum(1, 80).flatMap(n => Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T')))

  test("pure-match alignment equals trimStr") {
    check(Prop.forAll(dnaGen, Gen.chooseNum(1, 50)) { (seq, pos) =>
      val (mn, mx) = (1, 100)
      val a = AlignRead.align(seq, "I" * seq.length, pos, s"${seq.length}M", mn, mx).get
      a.seq == SeqTable.trimStr(seq, pos, mn, mx, '$') && a.insertions.isEmpty
    })
  }

  test("aligned length always equals the window width") {
    val cigarGen = for {
      m1 <- Gen.chooseNum(1, 20); i <- Gen.chooseNum(0, 5)
      d <- Gen.chooseNum(0, 5); m2 <- Gen.chooseNum(1, 20)
    } yield (m1, i, d, m2)
    check(Prop.forAll(cigarGen, Gen.chooseNum(1, 30)) { case ((m1, i, d, m2), pos) =>
      val len = m1 + i + m2
      val seq = "ACGT" * 15
      val cigar = s"${m1}M" + (if (i > 0) s"${i}I" else "") +
        (if (d > 0) s"${d}D" else "") + s"${m2}M"
      val a = AlignRead.align(seq.take(len), "I" * len, pos, cigar, 1, 90).get
      a.seq.length == 90 && a.qual.length == 90
    })
  }

  test("cigar endPos consistency: aligned non-gap span ends at endPos") {
    check(Prop.forAll(dnaGen, Gen.chooseNum(1, 20)) { (seq, pos) =>
      val cigar = s"${seq.length}M"
      val end = Cigar.endPos(pos, seq.length, cigar)
      end == pos + seq.length - 1
    })
  }

  test("hamming(x, x) == 0 and hamming is bounded by length") {
    check(Prop.forAll(dnaGen, dnaGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      var d = 0; var i = 0
      while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
      d >= 0 && d <= n &&
        (a != b || d == 0)
    })
  }

  test("jaccardSorted: identity 1, symmetric, bounded") {
    check(Prop.forAll(dnaGen, dnaGen) { (a, b) =>
      val sa = HashKernels.hashedShingles(a, 3)
      val sb = HashKernels.hashedShingles(b, 3)
      val j = HashKernels.jaccardSorted(sa, sb)
      val jr = HashKernels.jaccardSorted(sb, sa)
      j >= 0.0 && j <= 1.0 && j == jr &&
        HashKernels.jaccardSorted(sa, sa) == (if (sa.isEmpty) 0.0 else 1.0)
    })
  }

  test("minhash signature is permutation-invariant over the shingle set") {
    check(Prop.forAll(dnaGen) { a =>
      val sh = HashKernels.hashedShingles(a, 3)
      val shuffled = scala.util.Random.shuffle(sh.toList).toArray
      HashKernels.minhashSig(sh, 16).toSeq == HashKernels.minhashSig(shuffled, 16).toSeq
    })
  }

  test("simhash of identical text is identical; of disjoint vocab differs in expectation") {
    check(Prop.forAll(dnaGen) { a =>
      HashKernels.simhash64(a) == HashKernels.simhash64(a)
    })
  }

  test("translate length contract: ceil(len/3) with padding, floor without") {
    check(Prop.forAll(dnaGen) { nt =>
      val padded = CodonTable.translate(nt, pad = true)
      val truncated = CodonTable.translate(nt, pad = false)
      padded.length == (nt.length + 2) / 3 && truncated.length == nt.length / 3
    })
  }

  test("trimStr output always spans the window") {
    check(Prop.forAll(dnaGen, Gen.chooseNum(-10, 60), Gen.chooseNum(1, 30), Gen.chooseNum(31, 60)) {
      (seq, pos, mn, mx) =>
        SeqTable.trimStr(seq, pos, mn, mx, 'N').length == mx - mn + 1
    })
  }

  test("checkPositions partitions completely and disjointly") {
    val posGen = Gen.listOf(Gen.chooseNum(-5, 40))
    check(Prop.forAll(posGen) { ps =>
      val (in, out) = SeqTable.checkPositions(ps, 1, 20)
      in.forall(p => p >= 1 && p <= 20) &&
        out.forall(p => p < 1 || p > 20) &&
        in.length + out.length == ps.length
    })
  }

  test("bandGeometry always meets the recall target it was solved for") {
    import graft.ops.Similarity
    val tGen = Gen.chooseNum(0.05, 0.99)
    val rGen = Gen.chooseNum(0.5, 0.995)
    check(Prop.forAll(tGen, rGen) { (threshold, targetRecall) =>
      val (r, b) = Similarity.bandGeometry(threshold, targetRecall)
      r >= 1 && b >= 1 &&
        Similarity.candidateProb(threshold, r, b) >= targetRecall - 1e-9
    })
  }

  test("bandGeometry background pruning is monotone in threshold") {
    import graft.ops.Similarity
    // a HIGHER threshold must never get WORSE background pruning: the
    // solver prefers the largest bits/band that fits the band budget
    check(Prop.forAll(Gen.chooseNum(0.5, 0.93)) { t =>
      val (r1, b1) = Similarity.bandGeometry(t)
      val (r2, b2) = Similarity.bandGeometry(math.min(t + 0.05, 0.99))
      Similarity.candidateProb(0.0, r2, b2) <=
        Similarity.candidateProb(0.0, r1, b1) + 1e-9
    })
  }

  test("winnowing guarantee: planted shared substring always detected") {
    import graft.ops.HashKernels
    val strGen = Gen.chooseNum(20, 200).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar))
    val k = 8; val w = 16
    check(Prop.forAll(strGen, strGen, Gen.stringOfN(w + k - 1, Gen.alphaLowerChar)) {
      (pre, post, shared) =>
        val fa = HashKernels.winnowedFingerprints(pre + shared, k, w).toSet
        val fb = HashKernels.winnowedFingerprints(shared + post, k, w).toSet
        fa.intersect(fb).nonEmpty
    })
  }

  // ---- CDC kernel properties (pure kernel, no Spark jobs) ----

  private def cdcChunks(text: String): Seq[String] = {
    val arr = graft.plans.CdcChunksExpr.kernel(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), 16, 0x07)
    (0 until arr.numElements()).map(j =>
      arr.getUTF8String(j).toString)
  }

  private val uniGen: Gen[String] = Gen.chooseNum(0, 400).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n'),
      1 -> Gen.oneOf('\u00e9', '\u4e2d'), 1 -> Gen.const('a'))))

  test("CDC chunks cover every input exactly, in order") {
    check(Prop.forAll(uniGen) { t =>
      val ch = cdcChunks(t)
      ch.mkString == t && (t.isEmpty || ch.forall(_.nonEmpty))
    })
  }

  test("CDC chunks never start on a malformed boundary and re-chunk identically") {
    check(Prop.forAll(uniGen) { t =>
      val ch = cdcChunks(t)
      ch == cdcChunks(t) &&
        ch.forall(c => c.isEmpty || !Character.isLowSurrogate(c.charAt(0)))
    })
  }

  test("CDC edit locality: all chunks after the first cut survive any prefix edit") {
    val longGen = Gen.chooseNum(300, 1200).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(longGen, Gen.alphaStr) { (t, prefix) =>
      val base = cdcChunks(t)
      base.size < 2 || {
        val edited = cdcChunks(prefix + t)
        edited.takeRight(base.size - 1) == base.tail
      }
    })
  }

  // ---- round-10 HTTP wire-layer properties (pure kernels, no Spark) ----

  private val headerNameGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaChar)).map("X-" + _)
  private val headerValGen: Gen[String] =
    Gen.chooseNum(0, 20).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', ';', '=', '.', '-')))).map(_.trim)

  test("HTTP responses round-trip: encode -> parse -> wire-decode -> charset-decode") {
    val bodyGen = Gen.chooseNum(0, 400).flatMap(n => Gen.stringOfN(n,
      Gen.frequency(20 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
        1 -> Gen.oneOf('\u00e9', '\u20ac', '\u2013', '<', '>', '&'))))
    val wireGen = Gen.oneOf("plain", "gzip", "chunked")
    val csGen = Gen.oneOf("utf-8", "windows-1252")
    check(Prop.forAll(bodyGen, wireGen, csGen, headerNameGen, headerValGen) {
      (body0, wire, cs, hk, hv) =>
        // restrict the body to what the charset can carry losslessly
        val body = if (cs == "utf-8") body0 else body0 // both cover the char pool
        val bytes = graft.io.Http.encodeResponse(200,
          Seq("Content-Type" -> s"text/html; charset=$cs", hk -> hv), body, cs, wire)
        val p = graft.io.Http.parse(bytes)
        val decoded = graft.io.Http.decode(
          graft.io.Http.decodeTransfer(p.body,
            p.headers.getOrElse("transfer-encoding", null),
            p.headers.getOrElse("content-encoding", null)),
          p.headers.getOrElse("content-type", null))
        p.status == 200 &&
          p.headers.get(hk.toLowerCase).forall(_ == hv) &&
          decoded == body
    })
  }

  test("chunked de-framing is the inverse of arbitrary chunkings") {
    val bytesGen = Gen.chooseNum(0, 500).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))
    val sizesGen = Gen.nonEmptyListOf(Gen.chooseNum(1, 64))
    check(Prop.forAll(bytesGen, sizesGen) { (body, sizes) =>
      val bos = new java.io.ByteArrayOutputStream()
      var off = 0
      var i = 0
      while (off < body.length) {
        val n = math.min(sizes(i % sizes.length), body.length - off)
        bos.write(f"$n%x\r\n".getBytes("ISO-8859-1"))
        bos.write(body, off, n)
        bos.write("\r\n".getBytes("ISO-8859-1"))
        off += n; i += 1
      }
      bos.write("0\r\n\r\n".getBytes("ISO-8859-1"))
      java.util.Arrays.equals(
        graft.io.Http.decodeTransfer(bos.toByteArray, "chunked", null), body)
    })
  }

  test("chunked de-framing never throws on arbitrary garbage") {
    val junkGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))
    check(Prop.forAll(junkGen) { junk =>
      graft.io.Http.decodeTransfer(junk, "chunked", null) != null &&
        graft.io.Http.decodeTransfer(junk, "chunked", "gzip") != null &&
        graft.io.Http.decodeTransfer(junk, null, "deflate") != null
    })
  }

  test("charset decode is total and BOM-stripping on arbitrary bytes") {
    val junkGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))
    val ctGen = Gen.oneOf(null, "", "text/html", "text/html; charset=utf-8",
      "text/html; charset=iso-8859-1", "text/html; charset=bogus-label")
    check(Prop.forAll(junkGen, ctGen) { (junk, ct) =>
      val out = graft.io.Http.decode(junk, ct)
      out != null && (out.isEmpty || out.charAt(0) != '\ufeff')
    })
  }

  test("numeric character references: decode agrees with a reference fold") {
    val tokenGen = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(6)),
      2 -> Gen.chooseNum(0x20, 0xFFFF).map(cp => s"&#$cp;"),
      2 -> Gen.chooseNum(0x20, 0xFFFF).map(cp => f"&#x$cp%x;"),
      1 -> Gen.const("&#"), 1 -> Gen.const(";"), 1 -> Gen.const("&"))
    check(Prop.forAll(Gen.listOf(tokenGen).map(_.mkString)) { s =>
      val out = graft.ops.HtmlExtract.decodeNumericRefsStr(s)
      // reference fold: regex-free scan — every well-formed BMP
      // non-surrogate ref decodes, everything else survives verbatim
      val re = "&#(?:([0-9]{1,7})|[xX]([0-9a-fA-F]{1,6}));".r
      val expected = re.replaceAllIn(s, m => {
        val cp = try {
          if (m.group(1) != null) Integer.parseInt(m.group(1))
          else Integer.parseInt(m.group(2), 16)
        } catch { case _: NumberFormatException => -1 }
        val rep = if (cp >= 0x20 && cp <= 0xFFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          String.valueOf(cp.toChar) else m.matched
        java.util.regex.Matcher.quoteReplacement(rep)
      })
      out == expected
    })
  }
}
