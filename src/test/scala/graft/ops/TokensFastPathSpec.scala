package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The ASCII fast path of HashKernels.tokensOf must be bit-identical
  * to the ICU route it shortcuts: ICU root-locale full lowercase on
  * pure-ASCII text is exactly 'A'..'Z' → 'a'..'z'. Pinned on a random
  * ASCII battery (all printable chars + every \s class char) and on
  * mixed text, where any non-ASCII char forces the ICU fallback.
  */
class TokensFastPathSpec extends AnyFunSuite {

  private def asciiStrings(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val pool = (0x20 to 0x7e).map(_.toChar) ++ "\t\n\f\r".toSeq
    (1 to 500).map { _ =>
      val n = rnd.nextInt(120)
      new String(Array.fill(n)(pool(rnd.nextInt(pool.length))))
    } ++ Seq("", " ", "\t\n", "ABC", "aBc DeF\tGH\n", "A" * 300,
      "MiXeD  CaSetokens\f\rEND")
  }

  test("ASCII fast path == ICU route, token for token") {
    asciiStrings(7).foreach { s =>
      val fast = HashKernels.tokensOf(s)
      val icu = HashKernels.tokensOfIcu(s)
      assert(fast.toSeq == icu.toSeq, s"diverged on ${s.take(60)}")
    }
  }

  test("any non-ASCII char routes through ICU (identical by construction)") {
    val rnd = new scala.util.Random(11)
    val mixed = (1 to 100).map { _ =>
      val base = asciiStrings(rnd.nextInt(1000)).head
      val pos = if (base.isEmpty) 0 else rnd.nextInt(base.length)
      base.take(pos) + "Σίσυφος Straße" + base.drop(pos)
    }
    mixed.foreach { s =>
      assert(HashKernels.tokensOf(s).toSeq == HashKernels.tokensOfIcu(s).toSeq)
    }
  }

  test("null and unicode-whitespace edges") {
    assert(HashKernels.tokensOf(null).isEmpty)
    // NBSP (U+00A0) is NOT \s — it stays inside a token on both routes
    // (and, being non-ASCII, it forces the ICU fallback)
    val s = "a\u00a0b c"
    assert(HashKernels.tokensOf(s).toSeq == HashKernels.tokensOfIcu(s).toSeq)
    assert(HashKernels.tokensOf(s).length == 2)
  }
}
