package graft

import graft.functions.UnicodeNorm
import graft.operators.{AsofJoin, KllSketch, RangeJoin, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join, bucketed range join, KLL quantile sketch, unicode
  * normalization, and int8-quantized ANN — each validated against
  * brute-force ground truth (and, for KLL, the paper's error bound under
  * real compaction, which the exact-window driver oracle can't exercise).
  */
class TemporalQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-temporal")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(graft.functions.TextStats.mix64(seed))(graft.functions.TextStats.mix64)

  // ---------------------------------------------------------------- as-of

  private def asofFixture = {
    import spark.implicits._
    // builds unique per (key, ts) as the contract requires
    val builds = Seq(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 150L, 15.0)
    ).toDF("k", "tus", "bval")
    val probes = Seq(
      (1L, 99L, "a"), (1L, 100L, "b"), (1L, 250L, "c"), (1L, 300L, "d"),
      (2L, 1000L, "e"), (3L, 50L, "f")
    ).toDF("k", "tus", "tag")
    (probes, builds)
  }

  test("asofBackward: inclusive backward match, null when no predecessor") {
    import spark.implicits._
    val (probes, builds) = asofFixture
    val out = AsofJoin.asofBackward(probes, builds, Seq("k"), "tus")
      .select($"tag", $"bval").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> None,          // before first build
      "b" -> Some(10.0),    // equal ts matches (inclusive)
      "c" -> Some(20.0),    // latest at-or-before 250
      "d" -> Some(30.0),
      "e" -> Some(15.0),    // long gap still matches without tolerance
      "f" -> None           // key with no builds at all
    ))
  }

  test("asofBackward: tolerance nulls out stale matches only") {
    import spark.implicits._
    val (probes, builds) = asofFixture
    val out = AsofJoin.asofBackward(probes, builds, Seq("k"), "tus", toleranceMicros = 100L)
      .select($"tag", $"bval").as[(String, Option[Double])].collect().toMap
    assert(out("e").isEmpty, "1000-150 > 100 must be out of tolerance")
    assert(out("b").contains(10.0) && out("c").contains(20.0) && out("d").contains(30.0))
  }

  test("asofBackward: randomized parity with brute-force, and a join-free single-shuffle plan") {
    import spark.implicits._
    val r = rng(7)
    val builds = Seq.tabulate(400) { i =>
      (math.floorMod(r.next(), 20), math.floorMod(r.next(), 10000), i.toDouble)
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique per (k, ts)
    val probes = Seq.tabulate(300) { i =>
      (math.floorMod(r.next(), 22), math.floorMod(r.next(), 10000), i.toLong)
    }
    val bDf = builds.toDF("k", "tus", "bval")
    val pDf = probes.toDF("k", "tus", "pid")
    val got = AsofJoin.asofBackward(pDf, bDf, Seq("k"), "tus")
      .select($"pid", $"bval").as[(Long, Option[Double])].collect().toMap
    val byKey = builds.groupBy(_._1)
    probes.foreach { case (k, ts, pid) =>
      val exp = byKey.get(k).flatMap(_.filter(_._2 <= ts).sortBy(_._2).lastOption).map(_._3)
      assert(got(pid) == exp, s"probe $pid key $k ts $ts")
    }
    val plan = AsofJoin.asofBackward(pDf, bDf, Seq("k"), "tus")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must be window-based, not a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"as-of should shuffle once on the key:\n$plan")
  }

  test("asofBackward: duplicate build rows at one (key, ts) detonate at run time") {
    import spark.implicits._
    val dup = Seq((1L, 100L, 1.0), (1L, 100L, 2.0)).toDF("k", "tus", "bval")
    val probes = Seq((1L, 150L, "p")).toDF("k", "tus", "tag")
    val e = intercept[Exception](
      AsofJoin.asofBackward(probes, dup, Seq("k"), "tus").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate rows at the same (keys, ts)")),
      s"wanted the loud contract failure, got: $e")
  }

  test("asofBackward: rejects non-long ts and clashing payload names") {
    import spark.implicits._
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0)).toDF("k", "tus", "bval")
    val ok = Seq((1L, 5L, 2.0)).toDF("k", "tus", "bval")
    intercept[IllegalArgumentException](AsofJoin.asofBackward(ok, ts, Seq("k"), "tus"))
    intercept[IllegalArgumentException](
      AsofJoin.asofBackward(ok, ok, Seq("k"), "tus")) // bval clashes
  }

  // ----------------------------------------------------------- range join

  test("pointInInterval: randomized parity with brute-force nested loop") {
    import spark.implicits._
    val r = rng(11)
    val points = Seq.tabulate(500)(i => (i.toLong, math.floorMod(r.next(), 100000) / 10.0))
    val ivs = Seq.tabulate(200) { i =>
      val lo = math.floorMod(r.next(), 100000) / 10.0
      (1000L + i, lo, lo + math.floorMod(r.next(), 400) / 10.0)
    }
    val got = RangeJoin.pointInInterval(
        points.toDF("pid", "x"), ivs.toDF("iid", "lo", "hi"),
        "x", "lo", "hi", bucketWidth = 25.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val exp = (for {
      (pid, x) <- points
      (iid, lo, hi) <- ivs
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == exp, s"got ${got.size} pairs, expected ${exp.size}")
  }

  test("pointInInterval: plan has no nested-loop/cartesian join") {
    import spark.implicits._
    val p = Seq((1L, 5.0)).toDF("pid", "x")
    val iv = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, iv, "x", "lo", "hi", 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must be an equi-join on buckets:\n$plan")
  }

  test("pointInInterval: loud guards for empty intervals and untuned width") {
    import spark.implicits._
    val p = Seq((1L, 5.0)).toDF("pid", "x")
    val bad = Seq((1L, 10.0, 0.0)).toDF("iid", "lo", "hi")
    val e1 = intercept[Exception](
      RangeJoin.pointInInterval(p, bad, "x", "lo", "hi", 8.0).collect())
    assert(e1.getMessage.contains("empty interval"))
    val wide = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e2 = intercept[Exception](
      RangeJoin.pointInInterval(p, wide, "x", "lo", "hi", 8.0, maxBucketsPerInterval = 16).collect())
    assert(e2.getMessage.contains("raise bucketWidth"))
  }

  // ------------------------------------------------------------------ KLL

  test("KllSketch: exact in the n <= k window, however partitioned") {
    import spark.implicits._
    val vals = rng(13).take(5000).map(v => math.floorMod(v, 1000000)).toArray
    val sorted = vals.sorted
    val phis = Array(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    def exact(phi: Double): Long = sorted(math.max(1, math.ceil(phi * vals.length).toLong).toInt - 1)
    // distributed: 8 partitions merged by Spark's aggregation
    val agg = udaf(KllSketch.KllAgg(8192, phis.toSeq),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val got = spark.createDataset(vals.toSeq).repartition(8)
      .agg(agg(col("value"))).as[Seq[Long]].head()
    assert(got == phis.map(exact).toSeq, "distributed exact-window quantiles differ from full sort")
  }

  test("KllSketch: two-level (per-batch build, then merge of stored sketches) equals one-level") {
    import spark.implicits._
    val vals = rng(29).take(4000).map(v => math.floorMod(v, 1 << 20)).toSeq
    val phis = Seq(0.1, 0.5, 0.9)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]()
    val one = udaf(KllSketch.KllAgg(8192, phis), enc)
    val buf = udaf(KllSketch.KllBufAgg(8192), enc)
    val mrg = udaf(KllSketch.KllMergeAgg(8192, phis),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.operators.KllBuf]())
    val df = vals.toDF("v").withColumn("batch", col("v") % 7).repartition(8)
    val direct = df.agg(one(col("v"))).as[Seq[Long]].head()
    val twoLevel = df.groupBy(col("batch")).agg(buf(col("v")).as("s"))
      .agg(mrg(col("s.k"), col("s.n"), col("s.coin"), col("s.levels"), col("s.sizes")))
      .as[Seq[Long]].head()
    assert(twoLevel == direct, "merged per-batch sketches must equal the single-pass sketch")
  }

  test("KllSketch: compaction preserves total weight and meets the rank-error bound") {
    val n = 60000
    val k = 256
    val vals = rng(17).take(n).map(v => math.floorMod(v, 10000000)).toArray
    var b = KllSketch.empty(k)
    vals.foreach(v => b = KllSketch.insert(b, v))
    assert(b.n == n)
    // total weight invariant: sum of items x 2^level == n exactly
    val w = (0 until b.levels.length).map(l => b.sizes(l).toLong << l).sum
    assert(w == n, s"weight drift: $w != $n")
    val sorted = vals.sorted
    val phis = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val qs = KllSketch.quantiles(b, phis)
    phis.zip(qs).foreach { case (phi, q) =>
      val trueRank = sorted.count(_ <= q).toLong
      val target = math.max(1L, math.ceil(phi * n).toLong)
      val err = math.abs(trueRank - target).toDouble / n
      assert(err <= 0.05, f"phi=$phi rank error $err%.4f > 5%% at k=$k")
      // the rank-query probe must agree with ground truth within the same
      // bound (estimateRank is the API a rank-error consumer calls)
      val estErr = math.abs(KllSketch.estimateRank(b, q) - trueRank).toDouble / n
      assert(estErr <= 0.05, f"phi=$phi estimateRank error $estErr%.4f > 5%%")
    }
  }

  test("KllSketch: merge of two compacted sketches stays within bound") {
    val k = 256
    val a = rng(19).take(40000).map(v => math.floorMod(v, 1 << 24)).toArray
    val c = rng(23).take(40000).map(v => math.floorMod(v, 1 << 24)).toArray
    var sa = KllSketch.empty(k); a.foreach(v => sa = KllSketch.insert(sa, v))
    var sc = KllSketch.empty(k); c.foreach(v => sc = KllSketch.insert(sc, v))
    val m = KllSketch.merge(sa, sc)
    val all = (a ++ c).sorted
    assert(m.n == all.length)
    val q = KllSketch.quantiles(m, Array(0.5))(0)
    val err = math.abs(all.count(_ <= q) - math.ceil(0.5 * all.length)).toDouble / all.length
    assert(err <= 0.05, f"post-merge median rank error $err%.4f")
  }

  // -------------------------------------------------------------- unicode

  test("UnicodeNorm: NFC composes, NFKC additionally folds compatibility forms") {
    val dec = "e\u0301"                       // e + combining acute
    assert(UnicodeNorm.nfc(dec) == "\u00e9")  // composed e-acute
    assert(UnicodeNorm.nfc("A\u030a") == "\u00c5") // A + ring -> Angstrom A
    assert(UnicodeNorm.nfc("\ufb01") == "\ufb01", "NFC must keep the fi ligature")
    assert(UnicodeNorm.nfkc("\ufb01") == "fi")
    assert(UnicodeNorm.nfkc("\uff21") == "A", "fullwidth A folds under NFKC")
    assert(UnicodeNorm.nfkc("\u00b2") == "2")
    // idempotence + ASCII fast path
    assert(UnicodeNorm.nfc("plain ascii") == "plain ascii")
    assert(UnicodeNorm.nfkc(UnicodeNorm.nfkc(dec)) == UnicodeNorm.nfkc(dec))
  }

  test("UnicodeNorm: expression path (codegen) agrees with the direct kernel, nulls pass through") {
    import spark.implicits._
    val mixed = "e\u0301 \ufb01 \uff21"
    val df = Seq(Some(mixed), Some("ok"), None).toDF("s")
    val got = df.select(
      UnicodeNorm.nfcNorm(col("s")).as("c"),
      UnicodeNorm.nfkcNorm(col("s")).as("k")
    ).as[(Option[String], Option[String])].collect()
    assert(got(0)._1.contains(UnicodeNorm.nfc(mixed)))
    assert(got(0)._2.contains(UnicodeNorm.nfkc(mixed)))
    assert(got(1) == ((Some("ok"), Some("ok"))))
    assert(got(2) == ((None, None)))
  }

  // ------------------------------------------------------------- int8 ANN

  test("knnSq8: exact top-k parity with knnBrute on the synthetic embeddings") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val typed = embs.select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    val queries = typed.filter(_._1 < 10).collect()
    def ranks(df: org.apache.spark.sql.DataFrame, q: String, n: String, c: String) =
      df.select(col(q), col(n), col(c)).as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (qid, rows) =>
          qid -> rows.sortBy(r => (-r._3, r._2)).map(_._2).toSeq
        }
    val brute = ranks(Similarity.knnBrute(typed, queries, k = 5)
      .toDF("query_id", "neighbor_id", "cosine"), "query_id", "neighbor_id", "cosine")
    val sq8 = ranks(Similarity.knnSq8(embs, "vec_id", "embedding", queries, k = 5, overfetch = 4),
      "qid", "nid", "cosine")
    assert(sq8 == brute, "int8 scan + exact rerank must reproduce brute-force ranks")
  }

  test("knnBq: binary scan + exact rerank reproduces brute-force ranks; sig packing") {
    import spark.implicits._
    // packing unit facts first: dim not a multiple of 64 pads, sign bit
    // placement is little-endian within the word, hamming is symmetric
    val sig = Similarity.binarizeSign(Array(1.0f, -2.0f, 0.0f, -0.5f))
    assert(sig.length == 1 && sig(0) == ((1L << 0) | (1L << 2)))
    val sig65 = Similarity.binarizeSign(Array.fill(65)(1.0f))
    assert(sig65.length == 2 && sig65(1) == 1L)
    assert(Similarity.hammingSig(sig65, Array(0L, 0L)) == 65)
    // asymmetric scorer identity: q·sign(v) recomputed from the sketch and
    // the index-aligned query projections must equal the direct projection
    // sum with per-bit signs
    val qv = Array.tabulate(8)(i => (i - 3.5).toFloat)
    val proj = Similarity.querySketchProj(qv, nWords = 2)
    val sk = Similarity.binarySketch(qv, nWords = 2)
    val direct = proj.indices.map { j =>
      val set = (sk(j >>> 6) >>> (j & 63) & 1L) == 1L
      if (set) proj(j).toDouble else -proj(j).toDouble
    }.sum
    val scored = Similarity.asymBinaryScore(proj, proj.foldLeft(0.0)(_ + _), sk)
    assert(math.abs(scored - direct) < 1e-6)
    // every sketch bit agrees with the sign of the query's own projection
    assert(proj.indices.forall(j => ((sk(j >>> 6) >>> (j & 63) & 1L) == 1L) == (proj(j) >= 0)))
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val typed = embs.select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    val queries = typed.filter(_._1 < 10).collect()
    def ranks(df: org.apache.spark.sql.DataFrame, q: String, n: String, c: String) =
      df.select(col(q), col(n), col(c)).as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (qid, rows) =>
          qid -> rows.sortBy(r => (-r._3, r._2)).map(_._2).toSeq
        }
    val brute = ranks(Similarity.knnBrute(typed, queries, k = 5)
      .toDF("query_id", "neighbor_id", "cosine"), "query_id", "neighbor_id", "cosine")
    val bq = ranks(Similarity.knnBq(embs, "vec_id", "embedding", queries, k = 5, overfetch = 16),
      "qid", "nid", "cosine")
    assert(bq == brute, "binary scan + exact rerank must reproduce brute-force ranks")
  }

  test("knnPq: ADC + exact rerank reproduces brute-force ranks; dim guard") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val typed = embs.select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    val queries = typed.filter(_._1 < 10).collect()
    def ranks(df: org.apache.spark.sql.DataFrame, q: String, n: String, c: String) =
      df.select(col(q), col(n), col(c)).as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (qid, rows) =>
          qid -> rows.sortBy(r => (-r._3, r._2)).map(_._2).toSeq
        }
    val brute = ranks(Similarity.knnBrute(typed, queries, k = 5)
      .toDF("query_id", "neighbor_id", "cosine"), "query_id", "neighbor_id", "cosine")
    val pq = ranks(Similarity.knnPq(embs, "vec_id", "embedding", queries,
      k = 5, m = 16, overfetch = 16, countHint = Some(5000L)), "qid", "nid", "cosine")
    assert(pq == brute, "PQ ADC scan + exact rerank must reproduce brute-force ranks")
    // dim not divisible by m must fail loudly at build time
    intercept[IllegalArgumentException] {
      Similarity.knnPq(embs, "vec_id", "embedding", queries, k = 5, m = 7,
        countHint = Some(5000L))
    }
  }

  test("quantizeSq8: zero vectors and sign symmetry") {
    assert(Similarity.quantizeSq8(Array(0.0f, 0.0f)).forall(_ == 0))
    val q = Similarity.quantizeSq8(Array(1.0f, -1.0f, 0.5f))
    assert(q(0) == 127 && q(1) == -127 && math.abs(q(2) - 64) <= 1)
    assert(Similarity.cosineSq8(Array[Byte](0, 0), Array[Byte](1, 2)) == -1.0,
      "zero-norm guard")
  }
}
