package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization known answers: every rule (scheme/host case,
  * www., default ports, fragments, tracking params, param sort) pinned
  * independently of the q_url_canonical oracle replay. */
class UrlCanonicalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url")
      .select(TextFunctions.canonicalUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getAs[String]("c"))).toSeq
  }

  test("all rules compose on one messy URL") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b?utm_source=x&z=1&a=2#frag")
      == Seq(Some("http://example.com/a/b?a=2&z=1")))
  }

  test("default ports drop, explicit non-default ports survive") {
    assert(canon(
      "https://example.com:443/x",
      "http://example.com:80/x",
      "https://example.com:8443/x",
      "ftp://Host:21/file")
      == Seq(Some("https://example.com/x"), Some("http://example.com/x"),
        Some("https://example.com:8443/x"), Some("ftp://host:21/file")))
  }

  test("empty path normalizes to / so host-only variants merge") {
    assert(canon("https://example.com", "https://example.com/",
      "https://WWW.example.com#top")
      == Seq.fill(3)(Some("https://example.com/")))
  }

  test("tracking-only query loses the ? entirely; names match " +
      "case-insensitively; semantic param case is preserved") {
    assert(canon(
      "https://a.com/x?utm_campaign=1&gclid=2&REF=3",
      "https://a.com/P?Q=V&utm_x=1")
      == Seq(Some("https://a.com/x"), Some("https://a.com/P?Q=V")))
  }

  test("param order cannot fork the key") {
    val Seq(a, b) = canon("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2")
    assert(a == b && a == Some("https://a.com/x?a=1&b=2"))
  }

  test("non-URLs and scheme-relative strings canonicalize to null") {
    assert(canon("not a url", "www.example.com/x", "//example.com/x")
      == Seq(None, None, None))
  }

  test("out-of-contract hosts null out rather than mangle the key") {
    // IPv6 literals and userinfo@ would otherwise truncate/pollute the
    // host split — a wrong non-null key silently merges distinct pages
    assert(canon("http://[::1]:8080/x", "https://user:pw@example.com/x")
      == Seq(None, None))
  }
}
