package graft

import graft.operators.UrlPatterns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlPatternsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-urlpatterns")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("templatize: digits -> N, query values -> V, host split") {
    import spark.implicits._
    val rows = Seq(
      "https://a.example.com/cal/2024/3/17?session=83aa&x=1",
      "http://b.example.com/about",
      "https://a.example.com/item9/page10",
      "https://c.example.com/p?q=",
      "https://d.example.com")
      .toDF("url")
      .select(UrlPatterns.host($"url").as("h"), UrlPatterns.template($"url").as("t"))
      .as[(String, String)].collect().toSeq
    assert(rows === Seq(
      ("a.example.com", "/cal/N/N/N?session=V&x=V"),
      ("b.example.com", "/about"),
      ("a.example.com", "/itemN/pageN"),
      ("c.example.com", "/p?q=V"),
      ("d.example.com", "")))
  }

  test("mineTraps: distinct threshold and the no-variable-slot exemption") {
    import spark.implicits._
    val urls =
      // 12 distinct calendar URLs on one host -> trap at minDistinct=10
      (1 to 12).map(i => s"https://t.com/cal/2024/$i") ++
        // the same static page fetched 15 times -> high count, NO slot, not a trap
        Seq.fill(15)("https://t.com/about") ++
        // 3 distinct tag pages -> slot but under threshold
        (1 to 3).map(i => s"https://t.com/tag/$i")
    val got = UrlPatterns.mineTraps(urls.toDF("url"), "url", minDistinct = 10)
      .orderBy($"template")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("t.com", "/about", 15L, 1L, 0L),
      ("t.com", "/cal/N/N", 12L, 12L, 1L),
      ("t.com", "/tag/N", 3L, 3L, 0L)))
  }
}
