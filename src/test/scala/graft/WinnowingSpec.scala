package graft

import graft.operators.Winnowing
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WinnowingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-winnowing")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sequential reference: k-gram md5-prefix hashes, per-window rightmost
    * min, distinct selections — implemented with explicit loops, unlike
    * the windowed production path.
    */
  private def reference(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = graft.functions.TextStats.tokens(text.toLowerCase)
    if (toks.length < k) return Set.empty
    val hs = toks.sliding(k).map { g =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }.toArray
    (0 to hs.length - w).flatMap { s =>
      val frame = (s until s + w)
      val min = frame.map(hs).min
      val pick = frame.filter(p => hs(p) == min).max // rightmost tie rule
      Some((pick.toLong, hs(pick)))
    }.toSet
  }

  test("fingerprints match the sequential reference on the real corpus") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = real.select($"doc_id", $"text").as[(Long, String)].collect().flatMap {
      case (id, t) => reference(t, 3, 4).map { case (p, h) => (id, p, h) }
    }.toSet
    val got = Winnowing.fingerprints(real, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("detection guarantee: docs sharing a w+k-1 token run share a fingerprint") {
    import spark.implicits._
    // the shared passage is 7 tokens = w + k - 1 + 1; prefix/suffix differ
    val passage = "storm warning heavy snow closes mountain roads"
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta"),
      (2L, s"one two $passage three four five"),
      (3L, "entirely different words everywhere here today")).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect()
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 intersect h2).nonEmpty, "shared passage must yield a shared fingerprint")
    // density: selections are a strict subset of grams but nonempty
    assert(fp.count(_._1 == 3L) >= 1)
    // short doc (< k + w - 1 tokens = 6): no full window, no fingerprints
    val short = Winnowing.fingerprints(
      Seq((9L, "too few words here now")).toDF("doc_id", "text"), "doc_id", "text", 3, 4)
    assert(short.count() === 0L)
  }
}
