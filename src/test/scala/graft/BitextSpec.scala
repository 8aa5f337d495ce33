package graft

import graft.operators.Bitext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bitext mining: canonical-key stripping (anchored, first-segment-only),
  * one-candidate-per-side selection, and the length-ratio gate.
  */
class BitextSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-bitext")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val langs = Seq("en", "fr", "de")

  test("canonicalKey strips only a leading language path segment") {
    val got = Seq(
      "https://a.com/en/about",        // -> stripped
      "https://a.com/fr/en/about",     // only the FIRST segment strips
      "https://a.com/docs/en/about",   // lang not first: untouched
      "http://b.org/de/",              // bare segment strips
      "https://a.com/enx/about")       // 'enx' is not a segment match
      .toDF("url")
      .select(Bitext.canonicalKey($"url", langs).as("k")).as[String].collect()
    assert(got.toSeq === Seq(
      "https://a.com/about",
      "https://a.com/en/about",
      "https://a.com/docs/en/about",
      "http://b.org/",
      "https://a.com/enx/about"))
  }

  test("canonicalKey rejects non-ISO lang codes loudly") {
    intercept[IllegalArgumentException] {
      Bitext.canonicalKey(lit("x"), Seq("english"))
    }
  }

  private def pages(rows: (Long, String, String, String)*) =
    rows.toDF("id", "lang", "url", "text")

  test("minePairs aligns pages sharing the stripped key, 1:1 by min id") {
    val p = pages(
      (1L, "en", "https://a.com/en/p1", "hello world"),
      (2L, "fr", "https://a.com/fr/p1", "bonjour monde"),
      (3L, "en", "https://a.com/en/p1", "duplicate english page"), // loses to id 1
      (4L, "fr", "https://a.com/fr/p2", "page sans anglais"),
      (5L, "de", "https://a.com/de/p1", "ignored lang"))
    val got = Bitext.minePairs(p, "url", "lang", "id", "text", "en", "fr", langs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("https://a.com/p1", 1L, 2L, 11L, 13L)))
  }

  test("length-ratio gate drops grossly mismatched candidates, integer-exactly") {
    val p = pages(
      (1L, "en", "https://a.com/en/p1", "x" * 10),
      (2L, "fr", "https://a.com/fr/p1", "y" * 21),   // 21 > 2*10 -> dropped
      (3L, "en", "https://a.com/en/p2", "x" * 10),
      (4L, "fr", "https://a.com/fr/p2", "y" * 20))   // 20 <= 2*10 -> kept (boundary)
    val got = Bitext.minePairs(p, "url", "lang", "id", "text", "en", "fr", langs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("https://a.com/p2", 3L, 4L, 10L, 20L)))
  }

  test("null text counts as length zero and only pairs with ratio-compatible (zero) lengths") {
    val p = pages(
      (1L, "en", "https://a.com/en/p1", null),
      (2L, "fr", "https://a.com/fr/p1", "non trivial"),  // 11 > 2*0 -> dropped
      (3L, "en", "https://a.com/en/p2", null),
      (4L, "fr", "https://a.com/fr/p2", ""))             // 0 <= 2*0 -> kept
    val got = Bitext.minePairs(p, "url", "lang", "id", "text", "en", "fr", langs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("https://a.com/p2", 3L, 4L, 0L, 0L)))
  }
}
