package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val sp = spark
    import sp.implicits._
    urls.toDF("u").select(Web.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizeUrl: case, default port, fragment, tracking, sort, slash") {
    assert(canon("HTTPS://WWW.Site.COM:443/A/B/?utm_source=x&b=2&a=1#frag") ==
      Seq("https://www.site.com/A/B?a=1&b=2"))
    assert(canon("http://site.com:80/") == Seq("http://site.com/"))
    assert(canon("http://site.com") == Seq("http://site.com/"))
    // non-default port survives; non-http scheme keeps its port
    assert(canon("https://site.com:8443/x") == Seq("https://site.com:8443/x"))
    assert(canon("ftp://site.com:443/x") == Seq("ftp://site.com:443/x"))
    // all-tracking query collapses to no query; ref/fbclid/gclid dropped
    assert(canon("https://s.com/p?utm_a=1&ref=z&fbclid=f&gclid=g") ==
      Seq("https://s.com/p"))
    // path case preserved; empty params removed; params sorted bytewise
    assert(canon("https://s.com/CaseSensitive?z=1&&a=2") ==
      Seq("https://s.com/CaseSensitive?a=2&z=1"))
  }

  test("urlDedup collapses variants onto one canonical key") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "https://a.com/x?id=1&a=1"),
      (2L, "HTTPS://A.COM:443/x/?a=1&utm_source=f&id=1"),
      (3L, "https://a.com/x?id=1&a=1#frag"),
      (4L, "https://a.com/y")).toDF("doc_id", "url")
    val got = Web.urlDedup(df, "doc_id", "url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toList == List(
      ("https://a.com/x?a=1&id=1", 3L, 3L, 1L),
      ("https://a.com/y", 1L, 1L, 4L)))
  }
}
