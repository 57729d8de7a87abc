package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parity pins for the compiled text kernels against the interpreted
  * expression chains they replaced: the kernels exist for speed, so the
  * ONLY acceptable behavioral delta is none. Random adversarial strings
  * (mixed case, every `\s` class member, unicode, empties) catch
  * tokenization drift the ASCII fixture can't.
  */
class KernelParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // characters chosen to stress the tokenizer: regex-\s members, NBSP
  // (NOT \s — must not split), unicode letters with case mappings,
  // punctuation, digits
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
    1 -> Gen.oneOf('\u00A0', 'É', 'ü', 'ß', '中', 'Σ', 'σ', '.', ',', '-', '@'))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))

  private def sample(n: Int): Seq[String] =
    Gen.listOfN(n, textGen)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))

  /** The pre-kernel interpreted gram chain, verbatim. */
  private def exprWordNgrams(text: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  test("wordNgrams kernel == interpreted expression chain (n = 1, 2, 3)") {
    val df = sample(300).toDF("text").cache()
    try {
      for (n <- Seq(1, 2, 3)) {
        val rows = df.select(
          HashKernels.wordNgramsUdf(n)(col("text")).as("kernel"),
          exprWordNgrams(col("text"), n).as("expr"),
          col("text"))
          .as[(Seq[String], Seq[String], String)].collect()
        rows.foreach { case (k, e, t) =>
          assert(k == e, s"n=$n diverged on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
        }
      }
    } finally df.unpersist()
  }

  test("tokenCount == tokensOf(_).length on adversarial strings") {
    // the count kernel skips the ICU lowercase pass entirely on the claim
    // that case mapping never crosses the \s boundary set — the generator's
    // Greek sigma / ß / NBSP members are exactly the mappings that would
    // break it if the claim were wrong
    sample(500).foreach { t =>
      assert(HashKernels.tokenCount(t) == HashKernels.tokensOf(t).length.toLong,
        s"diverged on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    assert(HashKernels.tokenCount(null) == 0L)
    assert(HashKernels.tokenCount("") == 0L)
    assert(HashKernels.tokenCount("  \t\n ") == 0L)
  }

  test("hashed shingle count == distinct substring count (collision-free inputs)") {
    val df = sample(300).toDF("text")
    val k = 5
    val exprCount = when(length(col("text")) > 0,
      size(array_distinct(
        transform(sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
          i => substring(col("text"), i, lit(k))))))
      .otherwise(0)
    val rows = df.select(
      size(HashKernels.hashedShinglesUdf(k)(col("text"))).as("kernel"),
      exprCount.as("expr"), col("text"))
      .as[(Int, Int, String)].collect()
    rows.foreach { case (kc, ec, t) =>
      assert(kc == ec, s"shingle count diverged on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("wordNgramHashes has exactly one hash per distinct gram") {
    sample(300).foreach { t =>
      for (n <- Seq(1, 3)) {
        assert(HashKernels.wordNgramHashes(t, n).length ==
          HashKernels.wordNgrams(t, n).length,
          s"hashed/string gram counts diverged on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
      }
    }
  }
}
