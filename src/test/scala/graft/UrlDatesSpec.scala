package graft

import graft.functions.UrlDates
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlDatesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-urldates")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dateOf(url: String): Option[String] = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlDates.publishDate($"u")).collect()
      .headOption.flatMap(r => Option(r.getString(0)))
  }

  test("slash and dash forms extract; slash wins when both appear") {
    assert(dateOf("https://h.com/2026/08/20/post.html") == Some("2026-08-20"))
    assert(dateOf("https://h.com/blog/post-2019-01-31-x.html") == Some("2019-01-31"))
    assert(dateOf("https://h.com/2026/08/20/also-1999-12-31-x") == Some("2026-08-20"))
    assert(dateOf("https://h.com/a/2026-02-03/") == Some("2026-02-03"))
  }

  test("invalid calendar components reject; bare numbers and trap grids do not match") {
    assert(dateOf("https://h.com/2026/13/40/post.html").isEmpty)   // month 13
    assert(dateOf("https://h.com/2026/00/10/post.html").isEmpty)   // month 0
    assert(dateOf("https://h.com/2026/12/32/post.html").isEmpty)   // day 32
    assert(dateOf("https://h.com/item/20260820/").isEmpty)          // undelimited
    assert(dateOf("https://h.com/v2026/08/20x/").isEmpty)           // no slash bounds
    assert(dateOf("https://h.com/price-2026-081-20").isEmpty)       // 3-digit month
    assert(dateOf("https://h.com/plain/page.html").isEmpty)
  }

  test("century bound: 18xx and 21xx never match") {
    assert(dateOf("https://h.com/1899/08/20/post").isEmpty)
    assert(dateOf("https://h.com/2100/08/20/post").isEmpty)
    assert(dateOf("https://h.com/1999/08/20/post") == Some("1999-08-20"))
  }

  test("isoDatePrefix: bare dates and ISO timestamps pass, traps and free text reject") {
    import spark.implicits._
    def p(s: String): Option[String] =
      Seq(Option(s)).toDF("s").select(UrlDates.isoDatePrefix($"s")).collect()
        .headOption.flatMap(r => Option(r.getString(0)))
    assert(p("2026-01-15") == Some("2026-01-15"))
    assert(p("2026-01-15T10:00:00Z") == Some("2026-01-15"))
    assert(p("2026-01-15 10:00:00") == Some("2026-01-15"))
    assert(p("2026-13-40T00:00:00Z").isEmpty) // calendar trap
    assert(p("2026-01-15x").isEmpty) // embedded, not a prefix boundary
    assert(p("yesterday").isEmpty)
    assert(p("2101-01-01").isEmpty) // century bound shared with the url grammar
  }

  test("publishDateFused precedence and fall-through on invalid upper layers") {
    import spark.implicits._
    def fuse(d: String, t: String, u: String): (Option[String], String) = {
      val r = Seq((Option(d), Option(t), u)).toDF("d", "t", "u")
        .select(UrlDates.publishDateFused($"d", $"t", $"u").as("f"))
        .select("f.date", "f.source").collect().head
      (Option(r.getString(0)), r.getString(1))
    }
    val url = "https://h.com/2026/03/17/p"
    assert(fuse("2026-01-15T10:00:00Z", "2026-02-16", url) == (Some("2026-01-15"), "declared"))
    assert(fuse(null, "2026-02-16", url) == (Some("2026-02-16"), "time"))
    assert(fuse(null, null, url) == (Some("2026-03-17"), "url"))
    assert(fuse(null, null, "https://h.com/p") == (None, "none"))
    // invalid declaration falls through, never poisons the fusion
    assert(fuse("2026-13-40T00:00:00Z", "2026-02-16", url) == (Some("2026-02-16"), "time"))
    assert(fuse("2026-13-40", "nope", url) == (Some("2026-03-17"), "url"))
  }
}
