package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization rules, one by one, plus idempotence and the
  * dedup representative choice. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("each rule fires: fragment, case, www, port, tracking, slash, sort") {
    assert(canon("http://a.com/x#frag") == Seq("http://a.com/x"))
    assert(canon("HTTP://WWW.A.COM/Path") == Seq("http://a.com/Path"),
      "scheme+host lowercase, path case preserved")
    assert(canon("http://a.com:80/x", "https://a.com:443/x", "http://a.com:8080/x") ==
      Seq("http://a.com/x", "https://a.com/x", "http://a.com:8080/x"),
      "only scheme-DEFAULT ports are stripped")
    assert(canon("http://a.com/x?utm_source=s&id=1") == Seq("http://a.com/x?id=1"),
      "leading tracking param promotes the next one")
    assert(canon("http://a.com/x?id=1&utm_a=1&gclid=2&ref=3") == Seq("http://a.com/x?id=1"),
      "consecutive trailing tracking params all go in one pass")
    assert(canon("http://a.com/x?utm_only=1") == Seq("http://a.com/x"),
      "a query of only tracking params disappears entirely")
    assert(canon("http://a.com/x/", "http://a.com/x/?b=2&a=1") ==
      Seq("http://a.com/x", "http://a.com/x?a=1&b=2"),
      "path trailing slash stripped even before a query; params sorted")
  }

  test("www strip is anchored to the host, never a param value or a bare www.com") {
    // review-caught: unanchored '://www.' rewrote URLs EMBEDDED in query
    // params, merging documents that point at different targets
    assert(canon("https://a.com/out?next=http://www.b.com/p") ==
      Seq("https://a.com/out?next=http://www.b.com/p"))
    // and 'www.com' is a registrable host, not a prefix
    assert(canon("http://www.com/x") == Seq("http://www.com/x"))
    assert(canon("http://www.a.com/x") == Seq("http://a.com/x"))
  }

  test("canonicalization is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.Site7.Example.com:443/Docs/3/?b=2&utm_x=9&a=1#s",
      "http://a.com:80/?ref=r",
      "http://plain.org/p?id=1")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once, "canonical form must be a fixed point")
  }

  test("dedupByUrl keeps the highest-quality doc, ties to the smallest id") {
    val docs = Seq(
      (1L, "http://a.com/x?utm_s=1", 10L),
      (2L, "HTTP://WWW.A.COM:80/x", 30L),
      (3L, "http://a.com/x/", 30L),
      (4L, "https://b.org/y", 5L)).toDF("doc_id", "url", "q")
    val got = UrlOps.dedupByUrl(docs, col("url"), col("doc_id"), col("q"))
      .orderBy("canon_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("http://a.com/x", 2L, 30L, 3L),
      ("https://b.org/y", 4L, 5L, 1L)), s"got ${got.toSeq}")
  }
}
