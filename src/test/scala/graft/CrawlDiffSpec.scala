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
