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

  test("§2.2.1 group selection: exact product-token group beats *, case-insensitively") {
    val r = "User-agent: GoogleBot\nDisallow: /private\n" +
      "User-agent: *\nDisallow: /\n"
    def evalFor(agent: String, path: String): Boolean =
      Robots.allowed(Robots.parseFor(r, agent), path)
    assert(!evalFor("googlebot", "/private/x")) // its own group's rule
    assert(evalFor("googlebot", "/public"))     // NOT the * lockdown
    assert(!evalFor("bingbot", "/public"))      // no exact group → * applies
    assert(evalFor("GOOGLEBOT", "/public"))     // token folding both ways
  }

  test("§2.2.1: an EMPTY exact group means allow-all, never fallback to *") {
    // the Crawl-delay line closes nicebot's agent-line run, so its
    // group exists with ZERO path rules → everything allowed for it
    // (a blank line would NOT close the run — RFC 9309's ABNF lets
    // empty lines sit between user-agent lines of one group)
    val r = "User-agent: nicebot\nCrawl-delay: 1\nUser-agent: *\nDisallow: /\n"
    assert(Robots.allowed(Robots.parseFor(r, "nicebot"), "/anything"))
    assert(!Robots.allowed(Robots.parseFor(r, "other"), "/anything"))
    // and an empty-line-separated agent run IS one shared group
    val merged = "User-agent: nicebot\n\nUser-agent: also\nDisallow: /z\n"
    assert(!Robots.allowed(Robots.parseFor(merged, "nicebot"), "/z/1"))
  }

  test("§2.2.1: a shared agent-line run (token + *) serves both selections") {
    val r = "User-agent: dualbot\nUser-agent: *\nDisallow: /x\n"
    assert(!Robots.allowed(Robots.parseFor(r, "dualbot"), "/x/1"))
    assert(!Robots.allowed(Robots.parseFor(r, "anyone"), "/x/1"))
    assert(Robots.allowed(Robots.parseFor(r, "dualbot"), "/y"))
  }

  test("Crawl-delay follows group selection: exact group without a delay is null") {
    val r = "User-agent: slowbot\nDisallow: /a\n" +
      "User-agent: *\nCrawl-delay: 7\n"
    assert(Robots.crawlDelayOf(r, "slowbot").isNaN) // exact group, no delay
    assert(Robots.crawlDelayOf(r, "fastbot") == 7.0) // fallback to *
    val r2 = "User-agent: slowbot\nCrawl-delay: 2.5\nUser-agent: *\nCrawl-delay: 7\n"
    assert(Robots.crawlDelayOf(r2, "SlowBot") == 2.5)
  }

  test("comments, blank lines, and empty Disallow are inert") {
    val r = "# header\nUser-agent: *  # star\n\nDisallow:\nDisallow: /q # trailing\n"
    assert(eval(r, "/anything"))
    assert(!eval(r, "/q/1"))
    assert(eval(null, "/x"))
    assert(eval("", "/x"))
  }

  test("RFC 9309 special characters: * spans octets, trailing $ anchors the end") {
    // '*' mid-pattern
    val r1 = "User-agent: *\nDisallow: /fr*Doc\n"
    assert(!eval(r1, "/fr/Doc-3"))
    assert(!eval(r1, "/frxxDocyy"))
    assert(eval(r1, "/fr/page"))
    assert(eval(r1, "/en/Doc-3"))
    // '$' end anchor, with and without '*'
    val r2 = "User-agent: *\nDisallow: /*.json$\n"
    assert(!eval(r2, "/api/data.json"))
    assert(eval(r2, "/api/data.json?x=1"))
    assert(eval(r2, "/api/data.jsonl"))
    val r3 = "User-agent: *\nDisallow: /exact$\n"
    assert(!eval(r3, "/exact"))
    assert(eval(r3, "/exact/sub"))
    // specificity = pattern length: the longer wildcard rule prevails
    val r4 = "User-agent: *\nDisallow: /a\nAllow: /a*/keep\n"
    assert(eval(r4, "/a/x/keep"))
    assert(!eval(r4, "/a/x/drop"))
    // literal '*' rules that never matched before still behave (prefix fallback)
    val r5 = "User-agent: *\nDisallow: /plain\n"
    assert(!eval(r5, "/plain/sub") && eval(r5, "/other"))
    // consecutive '**' and trailing '*'
    val r6 = "User-agent: *\nDisallow: /x**y*\n"
    assert(!eval(r6, "/xzzy-tail"))
    assert(eval(r6, "/x-no-match"))
  }

  test("Crawl-delay: first valid value in the * group; others ignored") {
    def delay(t: String): Double = Robots.crawlDelayStar(t)
    assert(delay("User-agent: *\nCrawl-delay: 1.5\nCrawl-delay: 9\n") === 1.5)
    assert(delay("User-agent: bot\nCrawl-delay: 4\nUser-agent: *\nDisallow: /x\n").isNaN)
    assert(delay("User-agent: *\nCrawl-delay: -3\n").isNaN)
    assert(delay("User-agent: *\nCrawl-delay: soon\n").isNaN)
    assert(delay(null).isNaN)
  }

  test("Sitemap lines collect file-wide, in order, group-independent") {
    val t = "Sitemap: https://e.com/a.xml\nUser-agent: bot\nDisallow: /\n" +
      "sitemap: https://e.com/b.xml # case-insensitive\nSitemap:\n"
    assert(Robots.sitemapsOf(t).toSeq ===
      Seq("https://e.com/a.xml", "https://e.com/b.xml"))
    assert(Robots.sitemapsOf(null).isEmpty)
  }
}
