package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning validated against a hand-computed toy corpus, a
  * sequential reference implementation on the real corpus, and the
  * training/inference consistency contract.
  */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-bpe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sequential reference BPE: symbol arrays, explicit greedy
    * left-to-right merge application with overlap skipping — an
    * implementation deliberately UNLIKE the string-replace production
    * path, so agreement checks semantics, not shared code.
    */
  private def referenceBpe(words: Seq[(String, Long)], k: Int): Seq[(String, String, Long, Long)] = {
    var vocab = words.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val out = Seq.newBuilder[(String, String, Long, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((t1, t2), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (syms, f) =>
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == t1 && syms(i + 1) == t2) {
            merged += t1 + t2; i += 2
          } else { merged += syms(i); i += 1 }
        }
        (merged.toArray, f)
      }
      out += ((t1, t2, cnt, vocab.map { case (s, f) => s.length * f }.sum))
    }
    out.result()
  }

  test("learn: hand-computed toy corpus with overlap and tie-break") {
    import spark.implicits._
    // "aaaa"x3 makes (a,a) win with cnt 9; greedy must yield [aa,aa]
    // (4 symbols x3 freq), not [aa,a,a]. Round 2: pairs are (aa,aa) 3,
    // (a,b) 2, (b,a) 2 — tie between (a,b) and (b,a) broken by t1 asc.
    val docs = Seq(
      "aaaa aaaa aaaa ab ab ba ba a a a a a").toDF("text")
    val got = BpeTrain.learn(spark, docs, "text", 3)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    // tokens after merge1: aaaa->2 (x3) + ab 2 (x2) + ba 2 (x2) + a 1 (x5) = 19
    assert(got(0) === ((1L, "a", "a", 9L, 19L)))
    assert(got(1) === ((2L, "aa", "aa", 3L, 16L)))
    assert(got(2) === ((3L, "a", "b", 2L, 14L)))
  }

  test("learn matches the sequential reference on the real corpus") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = real.select($"text").as[String].collect()
      .flatMap(t => graft.functions.TextStats.tokens(t.toLowerCase))
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }.toSeq
    val want = referenceBpe(words, 6)
    val got = BpeTrain.learn(spark, real, "text", 6)
      .as[(Long, String, String, Long, Long)].collect().toSeq
      .map { case (_, t1, t2, c, ta) => (t1, t2, c, ta) }
    assert(got === want)
  }

  test("segment agrees with the final training symbolization") {
    import spark.implicits._
    val docs = Seq("the theme there brother the them").toDF("text")
    val learned = BpeTrain.learn(spark, docs, "text", 5)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val merges = learned.map { case (_, t1, t2, _, _) => (t1, t2) }
    // re-segmenting every corpus word through the learned merge list and
    // summing lengths must reproduce the last tokens_after — inference
    // IS training's final state on the training corpus
    val words = Seq("the", "theme", "there", "brother", "the", "them")
    val total = words.map(w => BpeTrain.segment(w, merges).length).sum
    assert(total.toLong === learned.last._5)
    // and a merged word segments to fewer, multi-char symbols
    assert(BpeTrain.segment("the", merges).length < 3)
  }

  test("subwordCounts equals per-word segment() sums on the real corpus") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = BpeTrain.learn(spark, real, "text", 6)
      .as[(Long, String, String, Long, Long)].collect().toSeq
      .map { case (_, t1, t2, _, _) => (t1, t2) }
    val got = BpeTrain.subwordCounts(real, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    val want = real.select($"doc_id", $"text").as[(Long, String)].collect().flatMap {
      case (id, t) =>
        val toks = graft.functions.TextStats.tokens(t.toLowerCase)
        if (toks.isEmpty) None
        else Some(id -> toks.map(w => BpeTrain.segment(w, merges).length.toLong).sum)
    }.toMap
    assert(got === want)
  }

  test("segment symbolizes by code point (surrogate pairs stay whole)") {
    // U+1D552 MATHEMATICAL DOUBLE-STRUCK SMALL A is a surrogate pair in
    // UTF-16; with no applicable merges it must stay ONE symbol, exactly
    // as training's regexp (.) symbolization treats it
    val word = new String(Character.toChars(0x1D552)) + "b"
    val got = BpeTrain.segment(word, Seq.empty)
    assert(got.toSeq === Seq(new String(Character.toChars(0x1D552)), "b"))
  }

  test("learn throws loudly when pairs run out before numMerges") {
    import spark.implicits._
    val docs = Seq("ab ab ab").toDF("text")
    val e = intercept[IllegalStateException] {
      BpeTrain.learn(spark, docs, "text", 3)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("learnInMemory is bit-identical to the distributed learn (rows, ties, tokens_after)") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = BpeTrain.learn(spark, real, "text", 8)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val mem = BpeTrain.learnInMemory(spark, real, "text", 8)
      .orderBy($"rank").as[(Long, String, String, Long, Long)].collect().toSeq
    assert(mem === dist)
    // and at a depth the distributed path would never run per-merge jobs
    // for: the deep path must still agree with the sequential reference
    val words = real.select($"text").as[String].collect()
      .flatMap(t => graft.functions.TextStats.tokens(t.toLowerCase))
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }.toSeq
    val want = referenceBpe(words, 40)
    val deep = BpeTrain.learnInMemory(spark, real, "text", 40)
      .orderBy($"rank").as[(Long, String, String, Long, Long)].collect().toSeq
      .map { case (_, t1, t2, c, ta) => (t1, t2, c, ta) }
    assert(deep === want)
  }

  test("learnInMemory: toy corpus semantics (overlap greedy, tie-break) + loud exhaustion") {
    import spark.implicits._
    val docs = Seq("aaaa aaaa aaaa ab ab ba ba a a a a a").toDF("text")
    val got = BpeTrain.learnInMemory(spark, docs, "text", 3)
      .orderBy($"rank").as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got(0) === ((1L, "a", "a", 9L, 19L)))
    assert(got(1) === ((2L, "aa", "aa", 3L, 16L)))
    assert(got(2) === ((3L, "a", "b", 2L, 14L)))
    val e = intercept[IllegalStateException] {
      BpeTrain.learnInMemory(spark, Seq("ab ab ab").toDF("text"), "text", 3)
    }
    assert(e.getMessage.contains("exhausted"))
  }
}
