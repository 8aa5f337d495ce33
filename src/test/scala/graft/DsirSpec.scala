package graft

import graft.operators.Dsir
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSIR-style importance selection: gram/bucket construction, the integer
  * linear score's sign semantics, deterministic top-n with tie-break, null
  * handling, and the exact overflow guard.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-dsir")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gramBuckets: unigrams + adjacent bigrams, repeats kept, null/empty empty") {
    val bs = Dsir.gramBuckets("The the cat", 256)
    // 3 unigrams + 2 bigrams
    assert(bs.length == 5)
    // lowercased: "the" twice -> identical buckets at positions 0 and 1
    assert(bs(0) == bs(1))
    assert(bs.forall(b => b >= 0 && b < 256))
    assert(Dsir.gramBuckets(null, 256).isEmpty)
    assert(Dsir.gramBuckets("   ", 256).isEmpty)
  }

  test("bucketCounts is the dense histogram of gramBuckets over the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma beta")).toDF("id", "text")
    val got = Dsir.bucketCounts(docs, "text", 64)
    val exp = new Array[Long](64)
    Seq("alpha beta", "beta gamma beta")
      .flatMap(t => Dsir.gramBuckets(t, 64))
      .foreach(b => exp(b) += 1)
    assert(got.toSeq == exp.toSeq)
  }

  test("score sign: target-heavy grams score positive, raw-only grams negative") {
    import spark.implicits._
    // target corpus = science docs, raw corpus = science + spam
    val target = Seq((1L, "quantum physics"), (2L, "quantum theory")).toDF("id", "text")
    val raw = target.union(
      Seq((3L, "buy pills now"), (4L, "buy pills cheap")).toDF("id", "text"))
    val n = 256
    val t = Dsir.bucketCounts(target, "text", n)
    val r = Dsir.bucketCounts(raw, "text", n)
    val scores = Dsir
      .scoreDocs(raw, "id", "text", t, r)
      .as[(Long, Long, Long)]
      .collect()
      .map { case (id, s, g) => id -> ((s, g)) }
      .toMap
    // science docs (every gram present in target) must outscore spam docs
    // (every gram absent from target -> strictly negative contribution)
    assert(scores(1L)._1 > 0 && scores(2L)._1 > 0)
    assert(scores(3L)._1 < 0 && scores(4L)._1 < 0)
    assert(scores(3L)._2 == 5L) // 3 unigrams + 2 bigrams
  }

  test("selectTop is deterministic: score desc then id asc, ties cut by id") {
    import spark.implicits._
    // two docs with IDENTICAL text tie exactly; id breaks the tie
    val raw = Seq((7L, "good doc"), (3L, "good doc"), (9L, "bad bad")).toDF("id", "text")
    val target = Seq((1L, "good doc")).toDF("id", "text")
    val n = 64
    val t = Dsir.bucketCounts(target, "text", n)
    val r = Dsir.bucketCounts(raw, "text", n)
    val top = Dsir.selectTop(raw, "id", "text", t, r, 2).select("id").as[Long].collect()
    assert(top.toSeq == Seq(3L, 7L))
  }

  test("null text scores 0 with 0 grams and stays a row") {
    import spark.implicits._
    val raw = Seq((1L, "real text"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val n = 64
    val t = Dsir.bucketCounts(raw, "text", n)
    val out = Dsir
      .scoreDocs(raw, "id", "text", t, t)
      .as[(Long, Long, Long)]
      .collect()
      .map { case (id, s, g) => id -> ((s, g)) }
      .toMap
    assert(out(2L) == ((0L, 0L)))
    // target == raw -> every delta is cntT*tot - cntT*tot = 0
    assert(out(1L)._1 == 0L && out(1L)._2 == 3L)
  }

  test("overflow guard fires loudly instead of wrapping") {
    import spark.implicits._
    val raw = Seq((1L, Seq.fill(40)("w").mkString(" "))).toDF("id", "text")
    // disjoint masses: delta(0) = 2^30 * 2^30 = 2^60, so maxGrams = 4
    // and the 79-gram doc trips the guard
    val t = Array.fill(64)(0L); t(0) = 1L << 30
    val r = Array.fill(64)(0L); r(1) = 1L << 30
    val e = intercept[org.apache.spark.SparkException] {
      Dsir.scoreDocs(raw, "id", "text", t, r).collect()
    }
    assert(e.getMessage.contains("overflow-safe") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow-safe")))
  }

  test("table construction itself fails loudly when cross products overflow") {
    val t = Array.fill(4)(Long.MaxValue / 2)
    intercept[ArithmeticException] {
      import spark.implicits._
      Dsir.scoreDocs(Seq((1L, "x")).toDF("id", "text"), "id", "text", t, t).collect()
    }
  }
}
