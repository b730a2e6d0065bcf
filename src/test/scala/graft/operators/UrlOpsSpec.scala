package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PSL-algorithm laws for UrlOps: host extraction, longest-match suffix,
  * wildcard and exception precedence, the implicit `*` rule, and eTLD+1
  * derivation — each case hand-derived from the publicsuffix.org
  * algorithm spec against the embedded rule snapshot. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(urls: Seq[String]): Map[String, (String, String, String)] =
    urls.toDF("url")
      .select(col("url"), UrlOps.hostOf(col("url")).as("host"))
      .select(col("url"), col("host"),
        UrlOps.publicSuffix(col("host")).as("suffix"),
        UrlOps.registrableDomain(col("host")).as("reg"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3)))).toMap

  test("host extraction: scheme, userinfo, port, path, case, trailing dots") {
    val got = run(Seq(
      "HTTPS://User:Pw@WWW.Example.COM:8443/A/B?q=1#f",
      "example.org./x",
      "ftp://a.b.c",
      "plain.host:80",
      "nohost"))
    assert(got("HTTPS://User:Pw@WWW.Example.COM:8443/A/B?q=1#f")._1 ==
      "www.example.com")
    assert(got("example.org./x")._1 == "example.org")
    assert(got("ftp://a.b.c")._1 == "a.b.c")
    assert(got("plain.host:80")._1 == "plain.host")
    assert(got("nohost")._1 == "nohost") // a bare label is still a host
  }

  test("public suffix: longest match wins; implicit * for unlisted TLDs") {
    val got = run(Seq(
      "a.example.com",          // com
      "a.example.co.uk",        // co.uk beats uk
      "x.s3.amazonaws.com",     // 3-label rule beats com
      "foo.github.io",          // github.io beats io
      "something.xyzunlisted",  // implicit *: last label
      "singleton"))
    assert(got("a.example.com")._2 == "com")
    assert(got("a.example.co.uk")._2 == "co.uk")
    assert(got("x.s3.amazonaws.com")._2 == "s3.amazonaws.com")
    assert(got("foo.github.io")._2 == "github.io")
    assert(got("something.xyzunlisted")._2 == "xyzunlisted")
    assert(got("singleton")._2 == "singleton")
  }

  test("wildcard *.ck and exception !www.ck precedence") {
    val got = run(Seq(
      "any.ck",        // *.ck: any.ck IS a public suffix -> no registrable
      "x.any.ck",      // suffix any.ck, registrable x.any.ck
      "www.ck",        // exception: suffix ck, registrable www.ck
      "sub.www.ck"))   // exception host + label: registrable www.ck
    assert(got("any.ck") == (("any.ck", "any.ck", null)))
    assert(got("x.any.ck") == (("x.any.ck", "any.ck", "x.any.ck")))
    assert(got("www.ck") == (("www.ck", "ck", "www.ck")))
    assert(got("sub.www.ck")._3 == "www.ck")
  }

  test("registrable domain: suffix-only hosts have none; else suffix+1") {
    val got = run(Seq(
      "com", "co.uk", "github.io", "deep.a.b.example.com"))
    assert(got("com")._3 == null)
    assert(got("co.uk")._3 == null)
    assert(got("github.io")._3 == null)
    assert(got("deep.a.b.example.com")._3 == "example.com")
  }
}
