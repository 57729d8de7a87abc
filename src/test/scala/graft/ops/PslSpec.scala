package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the full-algorithm PSL matcher. Corpus-level agreement with
  * the SQL-expressible subset twin is oracle-gated (q_domain_stats_psl's
  * subset_agrees column); these pin the algorithm itself on the rule
  * shapes the subset cannot express — wildcards, exceptions, and
  * private-section platform suffixes.
  */
class PslSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(host: String): String = Psl.registrableDomain(host, Psl.snapshot)

  test("exact multi-part suffixes: one label past the suffix") {
    assert(d("news.blog.example.co.uk") === "example.co.uk")
    assert(d("example.co.uk") === "example.co.uk")
    assert(d("a.b.x.gob.mx") === "x.gob.mx")
    assert(d("deep.example.com.cn") === "example.com.cn")
  }

  test("default rule: unknown TLDs take the last two labels") {
    assert(d("news.blog.example.com") === "example.com")
    assert(d("x.example.de") === "example.de")
    assert(d("localhost") === "localhost")
    assert(d("example.notarealtld") === "example.notarealtld")
  }

  test("a host that IS a public suffix maps to itself (total grouping key)") {
    assert(d("co.uk") === "co.uk")
    assert(d("github.io") === "github.io")
    assert(d("com") === "com")
  }

  test("private-section platform suffixes split per tenant (the github.io class)") {
    assert(d("alice.github.io") === "alice.github.io")
    assert(d("www.alice.github.io") === "alice.github.io")
    assert(d("myblog.blogspot.com") === "myblog.blogspot.com")
    assert(d("a.myblog.blogspot.com.br") === "myblog.blogspot.com.br")
    assert(d("app-1234.herokuapp.com") === "app-1234.herokuapp.com")
    // and the subset twin would have merged all these into ONE domain:
    val subset = Seq("alice.github.io", "bob.github.io").toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).as[String].collect().toSet
    assert(subset === Set("github.io"), "subset twin merges tenants by design")
    assert(Set(d("alice.github.io"), d("bob.github.io")).size === 2)
  }

  test("wildcard rules match exactly one label; exceptions beat everything") {
    // *.ck: every single label under ck is itself a suffix...
    assert(d("foo.bar.ck") === "foo.bar.ck")
    assert(d("a.foo.bar.ck") === "foo.bar.ck")
    // ...EXCEPT www.ck, which the !www.ck exception carves back out
    assert(d("www.ck") === "www.ck")
    assert(d("sub.www.ck") === "www.ck")
    // a bare two-label host under a wildcard TLD is itself a suffix
    assert(d("x.np") === "x.np")
    assert(d("a.x.np") === "a.x.np")
  }

  test("column form agrees with the subset twin on subset-covered suffixes") {
    val hosts = Seq("www.src0.co.uk", "cdn.src5.de", "news.src3.fr",
      "src7.com.br", "www.src1.com.cn", "x.y.example.com", "plain.org",
      "a.b.example.ac.uk", "s.example.com.au", "t.example.co.jp")
    val df = hosts.toDF("h")
    val got = df.select(Psl.registrableDomainPsl(col("h")),
      UrlOps.registrableDomain(col("h"))).as[(String, String)].collect()
    got.zip(hosts).foreach { case ((psl, sub), h) =>
      assert(psl === sub, s"psl/subset disagree on covered host $h")
    }
  }

  test("round-10 snapshot broadening: new ccTLD multi-part and platform suffixes") {
    // ICANN additions
    assert(d("ville.paris.gouv.fr") === "paris.gouv.fr")
    assert(d("a.b.example.on.ca") === "example.on.ca")
    assert(d("school.example.k12.ca.us") === "example.k12.ca.us")
    assert(d("www.ministry.gov.qa") === "ministry.gov.qa")
    assert(d("x.firm.example.co.tz") === "example.co.tz")
    assert(d("shop.example.com.uy") === "example.com.uy")
    assert(d("anything.under.jm") === "anything.under.jm") // *.jm wildcard
    assert(d("a.anything.under.jm") === "anything.under.jm")
    // private-section platform tenants split per tenant
    assert(d("store-1.myshopify.com") === "store-1.myshopify.com")
    assert(d("app.tenant.onmicrosoft.com") === "tenant.onmicrosoft.com")
    assert(d("my-site.wixsite.com") === "my-site.wixsite.com")
    assert(d("demo.hf.space") === "demo.hf.space")
    assert(d("api.example.service.gov.uk") === "example.service.gov.uk")
    assert(d("pt-blog.blogspot.pt") === "pt-blog.blogspot.pt")
    assert(d("bucket.blob.core.windows.net") === "bucket.blob.core.windows.net")
    // and plain .com/.net registrants are untouched by the additions
    assert(d("www.shopify.com") === "shopify.com")
    assert(d("a.windows.net") === "windows.net")
  }

  test("IDN hosts fold to A-labels: U-label and punycode spellings group together") {
    assert(d("münchen.de") === "xn--mnchen-3ya.de")
    assert(d("xn--mnchen-3ya.de") === "xn--mnchen-3ya.de")
    assert(d("www.münchen.de") === d("www.xn--mnchen-3ya.de"))
    assert(d("bücher.example.co.uk") === "example.co.uk")
    // unfoldable garbage passes through — the grouping key stays total
    assert(d("bücher..") === "bücher..")
    // pure-ASCII fast path: byte-identical output
    assert(d("plain.example.com") === "example.com")
  }

  test("snapshot broadcast is memoized per SparkContext") {
    val sc = spark.sparkContext
    val b1 = Psl.snapshotBroadcast(sc)
    val b2 = Psl.snapshotBroadcast(sc)
    assert(b1.id === b2.id, "two columns in one session must reuse ONE broadcast")
    // and the column form goes through the same cache
    val df = Seq("a.example.co.uk").toDF("h")
      .select(Psl.registrableDomainPsl(col("h")).as("d1"),
        Psl.registrableDomainPsl(col("h")).as("d2"))
    assert(df.as[(String, String)].head() === (("example.co.uk", "example.co.uk")))
    assert(Psl.snapshotBroadcast(sc).id === b1.id)
  }

  test("parser: comments, blanks, case, and inline junk are handled") {
    val r = Psl.parse(Iterator(
      "// comment", "", "  CO.Example  trailing", "*.wild", "!except.wild"))
    assert(r.exact === Set("co.example"))
    assert(r.wildcard === Set("wild"))
    assert(r.exception === Set("except.wild"))
  }
}
