package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(urls: (Long, String)*) =
    UrlOps.parseUrls(urls.toDF("doc_id", "url")).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3), r.getString(4)))
      .toMap

  test("parseUrls: case-fold, default-port drop, utm strip, param sort, fragment drop") {
    val p = parse(
      0L -> "HTTPS://WWW.Site3.COM:443/a/b?utm_source=f&z=1&a=2#frag",
      1L -> "http://site3.com:443/a", // 443 is NOT http's default — kept
      2L -> "http://m.site9.org:80/x?id=1",
      3L -> "https://cdn.site1.com:8080/y", // non-default port kept
      4L -> "http://site2.org", // no path → '/'
      5L -> "http://site2.org/?utm_campaign=x&utm_source=y" // all params stripped
    )
    assert(p(0L) === (("www.site3.com", "site3.com", "https://www.site3.com/a/b?a=2&z=1")))
    assert(p(1L) === (("site3.com", "site3.com", "http://site3.com:443/a")))
    assert(p(2L) === (("m.site9.org", "site9.org", "http://m.site9.org/x?id=1")))
    assert(p(3L) === (("cdn.site1.com", "site1.com", "https://cdn.site1.com:8080/y")))
    assert(p(4L) === (("site2.org", "site2.org", "http://site2.org/")))
    assert(p(5L) === (("site2.org", "site2.org", "http://site2.org/")))
  }

  test("parseUrls: param order and tracking variants collapse to one canonical") {
    val p = parse(
      10L -> "http://site0.com/p?b=2&a=1",
      11L -> "HTTP://SITE0.com/p?a=1&utm_medium=email&b=2#top")
    assert(p(10L)._3 === p(11L)._3)
  }

  test("urlDedup: canonical variants collapse, lowest doc_id survives") {
    val parsed = UrlOps.parseUrls(Seq(
      5L -> "http://site0.com/p?b=2&a=1",
      3L -> "http://site0.com:80/p?a=1&b=2",
      9L -> "http://site0.com/q").toDF("doc_id", "url"))
    val d = UrlOps.urlDedup(parsed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d("http://site0.com/p?a=1&b=2") === ((3L, 2L)))
    assert(d("http://site0.com/q") === ((9L, 1L)))
  }

  test("domainStats: pages and distinct canonicals per registrable domain") {
    val docs = Seq(
      (0L, "x", "en"), (1L, "x", "en"), (2L, "x", "es"), (13L, "x", "en"))
      .toDF("doc_id", "text", "lang")
    val parsed = UrlOps.parseUrls(UrlOps.synthesizeUrls(docs))
    val s = UrlOps.domainStats(parsed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 0 → site0.com, doc 1 → site1.org, doc 2 → site2.com, doc 13 → site0.org
    assert(s.keySet === Set("site0.com", "site1.org", "site2.com", "site0.org"))
    assert(s.values.forall(_ == ((1L, 1L))))
  }

  test("synthesizeUrls exercises every normalization hazard, round-trips deterministically") {
    val docs = (0L until 60L).map(i => (i, "t", "en")).toDF("doc_id", "text", "lang")
    val urls = UrlOps.synthesizeUrls(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(urls(0L).startsWith("HTTPS://www.site0.com:443/"))
    assert(urls(0L).contains("#section2"))
    assert(urls(7L).contains(":8080"))
    val parsed = UrlOps.parseUrls(UrlOps.synthesizeUrls(docs))
    val canon = parsed.collect().map(_.getString(4))
    // every canonical is lowercase-host, fragment-free, utm-free
    assert(canon.forall(c => !c.contains("#") && !c.contains("utm_") && !c.contains("WWW")))
    // https default port dropped, redundant http :443 kept (doc 10: %3!=0 http, %5==0 :443)
    assert(canon.forall(c => !c.contains("https://") || !c.contains(":443")))
    val ten = parsed.filter(col("doc_id") === 10L).collect().head.getString(4)
    assert(ten.startsWith("http://") && ten.contains(":443"))
  }
}
