package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel pins for the RFC 9309 subset — no Spark jobs needed. */
class RobotsSpec extends AnyFunSuite {

  private def eval(robots: String, path: String): Boolean =
    Robots.allowed(Robots.parseStar(robots), path)

  test("longest prefix wins; Allow wins exact-length ties; default allow") {
    val r = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert(!eval(r, "/a/x"))
    assert(eval(r, "/a/b/c"))   // longer Allow beats shorter Disallow
    assert(eval(r, "/other"))   // no matching rule
    val tie = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert(eval(tie, "/p/q"))   // equal length: Allow wins
  }

  test("only the * group applies; consecutive agent lines share one group") {
    val r = "User-agent: googlebot\nDisallow: /\n" +
      "User-agent: foo\nUser-agent: *\nDisallow: /x\n"
    assert(eval(r, "/anything"))  // googlebot's lockdown is not ours
    assert(!eval(r, "/x/1"))      // the shared foo+* group is
    val after = "User-agent: *\nDisallow: /a\nUser-agent: bot\nDisallow: /b\n"
    assert(eval(after, "/b/1"))   // /b belongs to bot's group only
  }

  test("comments, blank lines, and empty Disallow are inert") {
    val r = "# header\nUser-agent: *  # star\n\nDisallow:\nDisallow: /q # trailing\n"
    assert(eval(r, "/anything"))
    assert(!eval(r, "/q/1"))
    assert(eval(null, "/x"))
    assert(eval("", "/x"))
  }
}
