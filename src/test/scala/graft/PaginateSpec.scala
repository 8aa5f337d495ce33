package graft

import graft.operators.Paginate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pagination stitching: page-order reassembly, standalone pass-through,
  * and the loud-failure contracts (cycle, fan-in) inherited from the
  * pointer-doubling resolver.
  */
class PaginateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-paginate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("chains stitch in page order; standalone pages pass through as 1-page chains") {
    import spark.implicits._
    // one 4-page chain a1→a2→a3→a4, one 2-page chain b1→b2, standalone c
    val pages = Seq(
      ("a3", "third"), ("a1", "first"), ("a4", "fourth"), ("a2", "second"),
      ("b2", "beta"), ("b1", "alpha"), ("c", "solo")).toDF("url", "text")
    val edges = Seq(("a1", "a2"), ("a2", "a3"), ("a3", "a4"), ("b1", "b2"))
      .toDF("src", "dst")
    val out = Paginate.stitch(pages, edges, "url", "text")
      .orderBy("head").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq == Seq(
      ("a1", 4L, "first second third fourth"),
      ("b1", 2L, "alpha beta"),
      ("c", 1L, "solo")))
  }

  test("a 20-page chain resolves (doubling reach) and a rel=next cycle fails loudly") {
    import spark.implicits._
    val pages = (1 to 20).map(i => (s"p$i", s"t$i")).toDF("url", "text")
    val edges = (1 until 20).map(i => (s"p$i", s"p${i + 1}")).toDF("src", "dst")
    val out = Paginate.stitch(pages, edges, "url", "text").collect()
    assert(out.length == 1 && out.head.getLong(1) == 20L)
    assert(out.head.getString(2) == (1 to 20).map(i => s"t$i").mkString(" "))

    val cyc = Seq(("x", "y"), ("y", "x")).toDF("src", "dst")
    val cp = Seq(("x", "1"), ("y", "2")).toDF("url", "text")
    val e = intercept[Exception] {
      Paginate.stitch(cp, cyc, "url", "text").collect()
    }
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("saturate"))
  }

  test("two pages naming the same next (fan-in) violate the functional contract loudly") {
    import spark.implicits._
    val pages = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("url", "text")
    val edges = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val e = intercept[Exception] {
      Paginate.stitch(pages, edges, "url", "text").collect()
    }
    assert(e.getMessage.contains("multiple outgoing edges"))
  }

  test("one page naming two nexts (fan-out) also fails loudly, not a silent merged chain") {
    import spark.implicits._
    val pages = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("url", "text")
    val edges = Seq(("a", "b"), ("a", "c")).toDF("src", "dst")
    val e = intercept[Exception] {
      Paginate.stitch(pages, edges, "url", "text").collect()
    }
    assert(e.getMessage.contains("multiple rel=next successors"))
  }
}
