package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-case pins for the URL/web-provenance kernels. The corpus-level
  * behavior is oracle-gated (q_url_normalize / q_url_dedup /
  * q_domain_stats); these pin the per-rule semantics on hand-built URLs
  * the synthetic derivation never produces.
  */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.normalize(col("url")))
      .as[String].collect().toSeq

  private def dom(hosts: String*): Seq[String] =
    hosts.toDF("h").select(UrlOps.registrableDomain(col("h")))
      .as[String].collect().toSeq

  test("scheme and host lower-case; path case preserved") {
    assert(norm("HTTP://WWW.Example.COM/Path/File.HTML") ===
      Seq("http://www.example.com/Path/File.HTML"))
  }

  test("default ports stripped, non-default and cross-scheme ports kept") {
    assert(norm(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "http://a.com:8080/x") ===
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:80/x",
        "http://a.com:8080/x"))
  }

  test("fragment dropped, empty path becomes /") {
    assert(norm("https://a.com#frag", "https://a.com", "https://a.com/#f") ===
      Seq("https://a.com/", "https://a.com/", "https://a.com/"))
  }

  test("tracking params dropped, survivors byte-sorted, bare ? dropped") {
    assert(norm(
      "https://a.com/p?utm_source=x&b=2&a=1",
      "https://a.com/p?fbclid=zzz",
      "https://a.com/p?gclid=1&ref=hn&mc_eid=7&id=9",
      "https://a.com/p?z=1&y=2&utm_medium=email&x=3") ===
      Seq("https://a.com/p?a=1&b=2",
        "https://a.com/p",
        "https://a.com/p?id=9",
        "https://a.com/p?x=3&y=2&z=1"))
  }

  test("utm_ prefix matches any suffix; non-tracker utmx-like keys survive") {
    assert(norm("https://a.com/p?utm_anything=1&utmx=2&refer=3") ===
      Seq("https://a.com/p?refer=3&utmx=2"))
  }

  test("trailing host dot stripped; userinfo dropped from the canonical form") {
    assert(norm("https://Example.com./x") === Seq("https://example.com/x"))
    assert(norm("https://user:pw@Example.com/x", "https://u@a.co.uk:8443/p") ===
      Seq("https://example.com/x", "https://a.co.uk:8443/p"))
    // and the registrable domain comes from the real host, not user@host
    assert(Seq("https://alice@news.Example.co.uk/x").toDF("url")
      .select(UrlOps.registrableDomain(UrlOps.host(col("url"))))
      .as[String].collect().toSeq === Seq("example.co.uk"))
  }

  test("userinfo splits at the LAST '@' (WHATWG): a@b@host yields host") {
    assert(Seq("https://a@b@Example.com/x").toDF("url")
      .select(UrlOps.host(col("url"))).as[String].head() === "example.com")
    assert(norm("http://u:p@w@site.org:80/p") === Seq("http://site.org/p"))
  }

  test("percent-encoding: unreserved escapes decode, others uppercase, malformed pass through") {
    assert(norm(
      "https://a.com/p%7e%41/f%2Fx",   // %7E unreserved -> ~, %41 -> A, %2f reserved -> %2F
      "https://a.com/p?k%7E=v%2c1",    // query side too, before sorting
      "https://a.com/100%zz/50%") ===  // malformed escapes stay literal
      Seq("https://a.com/p~A/f%2Fx",
        "https://a.com/p?k~=v%2C1",
        "https://a.com/100%zz/50%"))
    // decoding can expose a tracker key: %75tm_source= IS utm_source=
    assert(norm("https://a.com/p?%75tm_source=x&b=1") ===
      Seq("https://a.com/p?b=1"))
  }

  test("registrable domain: two labels unless a multi-part suffix applies") {
    assert(dom("news.blog.example.com", "example.com", "localhost",
      "a.b.example.co.uk", "example.co.uk", "co.uk",
      "x.example.com.au", "deep.example.com.cn") ===
      Seq("example.com", "example.com", "localhost",
        "example.co.uk", "example.co.uk", "co.uk",
        "example.com.au", "example.com.cn"))
  }

  test("300 randomized URLs: idempotent, domain-stable, params preserved exactly") {
    val r = new scala.util.Random(1234)
    def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.size))
    val urls = (1 to 300).map { i =>
      val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "Http"))
      val host = pick(Seq("Ex.COM", "a.b.Example.co.uk", "x.de", "News.Site.com.au",
        "plain.fr.", "deep.sub.domain.org"))
      val user = pick(Seq("", "", "", "u@", "user:pw@"))
      val port = pick(Seq("", ":80", ":443", ":8080", ":9"))
      val path = pick(Seq("", "/", s"/P$i/File.HTML", s"/a/$i",
        s"/e$i/%7e%4a/x%2Fy", s"/m$i/50%25off"))
      val keep = (0 until r.nextInt(3)).map(j => s"k$j=${r.nextInt(9)}")
      val drop = (0 until r.nextInt(3)).map(j => pick(Seq(s"utm_c$j=1", "fbclid=z", "gclid=7")))
      val params = r.shuffle(keep ++ drop)
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#Sec-2"))
      (s"$scheme://$user$host$port$path$q$frag", keep.toSet)
    }
    val once = norm(urls.map(_._1): _*)
    assert(norm(once: _*) === once, "normalize must be idempotent")
    once.zip(urls).foreach { case (n, (raw, keepSet)) =>
      assert(!n.contains("#"), s"fragment survived: $n")
      assert(!n.contains("@"), s"userinfo survived: $n")
      assert(n.substring(0, n.indexOf("://")).forall(c => c.isLower || !c.isLetter), n)
      // surviving params are exactly the non-tracker set, sorted
      val outParams = n.split("\\?").drop(1).mkString.split("&").filter(_.nonEmpty).toSeq
      assert(outParams.toSet === keepSet, s"$raw -> $n")
      assert(outParams === outParams.sorted, s"params not byte-sorted: $n")
    }
    // domain of the normalized form == domain of the raw form
    def domOfUrl(us: Seq[String]): Seq[String] =
      us.toDF("url")
        .select(UrlOps.registrableDomain(UrlOps.host(col("url"))))
        .as[String].collect().toSeq
    assert(domOfUrl(urls.map(_._1)) === domOfUrl(once))
  }

  test("a '?' inside the fragment is not a query") {
    // the query match is anchored to the pre-fragment prefix: this URL
    // has NO query, and normalize must not leak fragment content in
    assert(norm("http://a.com/p#x?y=1") === Seq("http://a.com/p"))
    // and a real query followed by a '?'-bearing fragment keeps only
    // the real query
    assert(norm("http://a.com/p?a=1#x?y=2&utm_source=z") ===
      Seq("http://a.com/p?a=1"))
  }

  test("normalize is idempotent") {
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/A/b?utm_source=x&b=2&a=1#f",
      "https://a.co.uk:8443/p?z=1&gclid=9",
      "http://plain.de")
    val once = norm(urls: _*)
    assert(norm(once: _*) === once)
  }
}
