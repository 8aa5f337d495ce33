package graft

import graft.operators.CrawlBudget
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CrawlBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-crawlbudget")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("allocate: per-host cap, priority ties by url, global budget cut") {
    import spark.implicits._
    // host 1 has 4 urls (cap 2 keeps the best 2: prio 9 then tie 5->url 12)
    // host 2 has 2; global budget 3 cuts the lowest-priority survivor
    val frontier = Seq(
      (11L, 1L, 9L), (12L, 1L, 5L), (13L, 1L, 5L), (14L, 1L, 1L),
      (21L, 2L, 8L), (22L, 2L, 3L)).toDF("url", "host", "priority")
    val got = CrawlBudget.allocate(frontier, "host", "url", "priority", 2, 3)
      .as[(Long, Long, Long)].collect().sortBy(r => (-r._3, r._2))
    assert(got === Array((1L, 11L, 9L), (2L, 21L, 8L), (1L, 12L, 5L)))
  }

  test("allocate matches a brute-force replay on a larger random-ish frontier") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, i % 13, (i * 37) % 50))
    val frontier = rows.toDF("url", "host", "priority")
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, hs) =>
      hs.sortBy(r => (-r._3, r._1)).take(7)
    }.sortBy(r => (-r._3, r._1)).take(60)
      .map(r => (r._2, r._1, r._3)).sortBy(r => (-r._3, r._2))
    val got = CrawlBudget.allocate(frontier, "host", "url", "priority", 7, 60)
      .as[(Long, Long, Long)].collect().sortBy(r => (-r._3, r._2)).toSeq
    assert(got === want)
  }

  test("allocateWithCaps: per-host caps enforced, default for absent hosts, maxCap guard loud") {
    import spark.implicits._
    import graft.operators.CrawlBudget
    val frontier = (0L until 30L).map(i => (i, i % 3, 100L - i)).toDF("url", "host", "priority")
    val caps = Seq((0L, 2), (1L, 5)).toDF("host", "cap") // host 2 falls to default
    val sel = CrawlBudget.allocateWithCaps(frontier, "host", "url", "priority",
      caps, "cap", defaultCap = 3, maxCap = 6, totalBudget = 100)
      .collect().groupBy(_.getLong(0)).map { case (h, rs) => h -> rs.length }
    assert(sel == Map(0L -> 2, 1L -> 5, 2L -> 3))
    // global budget cuts across hosts under the total order
    val cut = CrawlBudget.allocateWithCaps(frontier, "host", "url", "priority",
      caps, "cap", defaultCap = 3, maxCap = 6, totalBudget = 4).collect()
    assert(cut.length == 4)
    // cap above the aggregator bound must fail loudly, never truncate silently
    val bad = Seq((0L, 9)).toDF("host", "cap")
    val ex = intercept[Exception] {
      CrawlBudget.allocateWithCaps(frontier, "host", "url", "priority",
        bad, "cap", defaultCap = 3, maxCap = 6, totalBudget = 100).collect()
    }
    assert(ex.getMessage != null)
  }
}
