package graft

import graft.operators.CrawlDiff
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrawlDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-crawldiff")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("diff classifies all four statuses; reExtractSet is added+changed rows of the new snapshot") {
    import spark.implicits._
    val a = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3")).toDF("url", "dg")
    val b = Seq(("u1", "h1"), ("u2", "hX"), ("u4", "h4")).toDF("url", "dg")
    val got = CrawlDiff.diff(a, b, "url", "dg").as[(String, String)].collect().toSet
    assert(got == Set(("u1", "unchanged"), ("u2", "changed"), ("u3", "removed"), ("u4", "added")))
    val work = CrawlDiff.reExtractSet(a, b, "url", "dg").as[(String, String)].collect().toSet
    assert(work == Set(("u2", "hX"), ("u4", "h4")))
  }

  test("retentionPlan: latest-n per url, seq breaks same-second ties, no window in plan") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val snaps = Seq(
      // u1: three distinct seconds — keep the two latest
      ("u1", ts(100L), 1L), ("u1", ts(200L), 2L), ("u1", ts(300L), 3L),
      // u2: all in ONE second — seq must decide, keep seqs 12 and 11
      ("u2", ts(500L), 10L), ("u2", ts(500L), 11L), ("u2", ts(500L), 12L),
      // u3: fewer than n snapshots — all retained
      ("u3", ts(900L), 20L)).toDF("url", "ts", "seq")
    val got = CrawlDiff.retentionPlan(snaps, "url", "ts", "seq", n = 2)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    assert(got === Map(
      ("u1", 1L) -> false, ("u1", 2L) -> true, ("u1", 3L) -> true,
      ("u2", 10L) -> false, ("u2", 11L) -> true, ("u2", 12L) -> true,
      ("u3", 20L) -> true))
    // the hot-url guarantee: no Window operator in the plan
    val plan = CrawlDiff.retentionPlan(snaps, "url", "ts", "seq", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"retention must not window-sort a hot url:\n$plan")
    // out-of-range seq fails loudly instead of mis-sorting
    val bad = Seq(("u", ts(1L), 1L << 22)).toDF("url", "ts", "seq")
    val e = intercept[Exception] {
      CrawlDiff.retentionPlan(bad, "url", "ts", "seq", 1).collect()
    }
    assert(e.getMessage.contains("packed range") ||
      e.getCause != null && e.getCause.getMessage.contains("packed range"))
  }

  test("diff over a body-bearing snapshot shuffles digests only (bodies stay out of the exchange)") {
    import spark.implicits._
    // wide snapshot with a body column: the full-outer join must not
    // carry `body` — both Exchange inputs project (key, digest) only
    val a = Seq(("u1", "h1", "B" * 64)).toDF("url", "dg", "body")
    val b = Seq(("u1", "h1", "B" * 64)).toDF("url", "dg", "body")
    val plan = CrawlDiff.diff(a, b, "url", "dg").queryExecution.executedPlan.toString
    assert(!plan.contains("body#"), s"body column leaked into the diff plan:\n$plan")
  }
}
