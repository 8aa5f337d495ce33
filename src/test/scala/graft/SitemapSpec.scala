package graft

import graft.sources.Sitemap
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-sitemap")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def b(s: String) = s.getBytes("UTF-8")

  test("urlset: loc + lastmod (date-only and full ISO), entities, junk lastmod tolerated") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://x.org/a?p=1&amp;q=2</loc><lastmod>2025-03-04</lastmod></url>
        |  <url><loc> https://x.org/b </loc><lastmod>2025-03-04T05:06:07+02:00</lastmod></url>
        |  <url><loc>https://x.org/c</loc><lastmod>not a date</lastmod></url>
        |  <url><lastmod>2025-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val p = Sitemap.parse(b(xml))
    assert(p.children.isEmpty)
    assert(p.urls.map(_.loc) === Seq("https://x.org/a?p=1&q=2", "https://x.org/b", "https://x.org/c"))
    assert(p.urls(0).lastmod === java.sql.Timestamp.valueOf("2025-03-04 00:00:00"))
    assert(p.urls(1).lastmod === java.sql.Timestamp.from(java.time.Instant.parse("2025-03-04T03:06:07Z")))
    assert(p.urls(2).lastmod === null)
  }

  test("sitemapindex, plain-text, gzip envelope, garbage") {
    val idx =
      """<sitemapindex><sitemap><loc>https://x.org/s1.xml</loc></sitemap>
        |<sitemap><loc>https://x.org/s2.xml</loc><lastmod>2025-01-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.parse(b(idx)).children === Seq("https://x.org/s1.xml", "https://x.org/s2.xml"))
    assert(Sitemap.parse(b(idx)).urls.isEmpty)
    val txt = "https://x.org/p1\nnot-a-url\nhttps://x.org/p2\n"
    assert(Sitemap.parse(b(txt)).urls.map(_.loc) === Seq("https://x.org/p1", "https://x.org/p2"))
    assert(Sitemap.parse(graft.functions.Codecs.gzip(b(txt))).urls.length === 2)
    assert(Sitemap.parse(null).urls.isEmpty)
    assert(Sitemap.parse(Array[Byte](31, -117, 1, 2, 3)).urls.isEmpty) // corrupt gzip
  }

  test("frontier: child resolution one level, max-lastmod wins, new/stale/current split") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val sm =
      s"""<urlset>
         |<url><loc>https://x.org/new1</loc></url>
         |<url><loc>https://x.org/stale1</loc><lastmod>2025-06-01</lastmod></url>
         |<url><loc>https://x.org/current1</loc><lastmod>2025-01-01</lastmod></url>
         |<url><loc>https://x.org/dup</loc><lastmod>2025-02-01</lastmod></url>
         |</urlset>""".stripMargin
    val child =
      s"""<urlset>
         |<url><loc>https://x.org/childnew</loc></url>
         |<url><loc>https://x.org/dup</loc><lastmod>2025-07-01</lastmod></url>
         |</urlset>""".stripMargin
    val index =
      """<sitemapindex>
        |<sitemap><loc>https://x.org/child.xml</loc></sitemap>
        |<sitemap><loc>https://x.org/unfetched.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val sitemaps = Seq(
      ("https://x.org/sitemap.xml", b(sm)),
      ("https://x.org/index.xml", b(index)),
      ("https://x.org/child.xml", b(child))).toDF("url", "body")
    val crawled = Seq(
      ("https://x.org/stale1", ts("2025-05-01 00:00:00")),
      ("https://x.org/current1", ts("2025-03-01 00:00:00")),
      ("https://x.org/dup", ts("2025-06-15 00:00:00"))).toDF("url", "warc_ts")
    val out = Sitemap.frontier(sitemaps, crawled)
      .select($"loc", $"status").as[(String, String)].collect().sortBy(_._1)
    // dup: max(2025-02-01, 2025-07-01) = 07-01 > crawled 06-15 -> stale
    assert(out.toSeq === Seq(
      "https://x.org/childnew" -> "new",
      "https://x.org/dup" -> "stale",
      "https://x.org/new1" -> "new",
      "https://x.org/stale1" -> "stale"))
  }
}
