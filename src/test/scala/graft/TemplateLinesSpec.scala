package graft

import graft.operators.Boilerplate
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Per-site template-line removal: threshold semantics (rational, inclusive,
  * minDocs floor, per-site scoping), order-preserving recomposition, and the
  * hashed-key scale path's equivalence.
  */
class TemplateLinesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-boilerplate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(
      rows: Seq[(Long, String, String)],
      fracNum: Long = 1L,
      fracDen: Long = 2L,
      minDocs: Long = 3L,
      hashLines: Boolean = false
  ): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "site", "text")
    Boilerplate
      .stripTemplateLines(df, "doc_id", "site", "text", fracNum, fracDen, minDocs, hashLines)
      .as[(Long, String, String, Long, Long)]
      .collect()
      .map { case (id, _, clean, nLines, nRemoved) => id -> ((clean, nLines, nRemoved)) }
      .toMap
  }

  test("half-threshold template lines drop, unique content survives in order") {
    val nav = "Home | About"
    val rows = (0L until 6L).map { i =>
      (i, "a", s"$nav\nbody $i line one\nbody $i line two")
    }
    val out = run(rows)
    assert(out.size == 6)
    out.foreach { case (id, (clean, nLines, nRemoved)) =>
      assert(nLines == 3L && nRemoved == 1L)
      assert(clean == s"body $id line one\nbody $id line two")
    }
  }

  test("inclusive integer boundary: df*den >= num*n is template, one less doc is not") {
    // site of 6 docs, threshold 1/2: a line in exactly 3 docs IS template
    // (3*2 >= 6), a line in 2 is not
    val rows = (0L until 6L).map { i =>
      val boundary = if (i < 3) "\nExactly half footer" else ""
      val below = if (i < 2) "\nRare footer" else ""
      (i, "a", s"unique body $i$boundary$below")
    }
    val out = run(rows)
    // the exactly-half line is template (3*2 >= 6); the 2-doc line is kept
    assert(out(0L) == (("unique body 0\nRare footer", 3L, 1L)))
    assert(out(1L) == (("unique body 1\nRare footer", 3L, 1L)))
    assert(out(2L) == (("unique body 2", 2L, 1L)))
    assert(out(4L) == (("unique body 4", 1L, 0L)))
  }

  test("minDocs floor keeps tiny sites intact") {
    // 2-doc site where one line is in both docs (df*2 >= n) but df < minDocs
    val rows = Seq(
      (1L, "tiny", "shared line\nbody one"),
      (2L, "tiny", "shared line\nbody two"))
    val out = run(rows, minDocs = 3L)
    assert(out(1L) == (("shared line\nbody one", 2L, 0L)))
    assert(out(2L) == (("shared line\nbody two", 2L, 0L)))
  }

  test("frequency is scoped per site: the same line drops in one site, stays in another") {
    val banner = "This site uses cookies"
    val siteA = (0L until 4L).map(i => (i, "a", s"$banner\na-body $i"))
    // site b: banner appears once among 4 docs — content there
    val siteB = (10L until 14L).map(i =>
      (i, "b", if (i == 10L) s"$banner\nb-body $i" else s"b-body $i"))
    val out = run(siteA ++ siteB)
    assert(out(0L)._1 == "a-body 0" && out(0L)._3 == 1L)
    assert(out(10L)._1 == s"$banner\nb-body 10" && out(10L)._3 == 0L)
  }

  test("a doc of nothing but template lines recomposes to the empty string, row kept") {
    val rows = (0L until 4L).map { i =>
      if (i == 0L) (i, "a", "Home\nFooter")
      else (i, "a", s"Home\nbody $i\nFooter")
    }
    val out = run(rows)
    assert(out(0L) == (("", 2L, 2L)))
    assert(out(1L) == (("body 1", 3L, 2L)))
  }

  test("null text behaves as one empty line (and can itself be template)") {
    val rows = Seq(
      (0L, "a", null: String),
      (1L, "a", null: String),
      (2L, "a", null: String),
      (3L, "a", "real\ncontent"))
    val out = run(rows)
    // "" occurs in 3 of 4 docs -> template; the null docs lose their only line
    assert(out(0L) == (("", 1L, 1L)))
    assert(out(3L) == (("real\ncontent", 2L, 0L)))
  }

  test("hashLines scale path is output-identical to string keys") {
    val rows = (0L until 12L).flatMap { i =>
      Seq((i, s"s${i % 3}", s"Nav s${i % 3}\nbody $i\n" +
        (if (i % 2 == 0) "Even footer\n" else "") + s"tail $i"))
    }
    assert(run(rows) == run(rows, hashLines = true))
  }
}
