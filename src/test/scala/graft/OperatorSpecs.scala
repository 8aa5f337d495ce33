package graft

import graft.functions.TextStats
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the training-data-pipeline operators, validated against
  * brute-force ground truth on the driver-provided documents/embeddings
  * tables (sf0.001).
  */
class OperatorSpecs extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-ops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private lazy val docsLocal: Array[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text").as[(Long, String)].collect()
  }

  /** Brute-force exact jaccard over distinct 3-gram shingles. */
  private def bruteJaccardPairs(minJ: Double): Set[(Long, Long)] = {
    val sh = docsLocal.map { case (id, t) => id -> TextStats.shingleStrings(t, 3).toSet }.filter(_._2.nonEmpty)
    val out = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- sh.indices; j <- (i + 1) until sh.length) {
      val (ia, sa) = sh(i)
      val (ib, sb) = sh(j)
      val inter = sa.intersect(sb).size
      val j2 = inter.toDouble / (sa.size + sb.size - inter)
      if (j2 >= minJ) out += ((math.min(ia, ib), math.max(ia, ib)))
    }
    out.toSet
  }

  test("minhash LSH finds every true near-dup pair (jaccard >= 0.8), no wild false positives") {
    import spark.implicits._
    val truth = bruteJaccardPairs(0.8)
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Dedup
      .minhashPairs(docs, "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.7)
      .select($"a", $"b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val missed = truth -- got
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
    // est_jaccard >= 0.7 candidates should all have true jaccard >= 0.4
    val loose = bruteJaccardPairs(0.4)
    val spurious = got -- loose
    assert(spurious.isEmpty, s"wildly-false positives: $spurious")
  }

  test("simhash pairs = brute-force hamming <= 3 (banding has exact recall)") {
    import spark.implicits._
    val sigs = docsLocal.map { case (id, t) => id -> TextStats.simhash64(t) }
    val truth = (for {
      i <- sigs.indices
      j <- (i + 1) until sigs.length
      if TextStats.hamming64(sigs(i)._2, sigs(j)._2) <= 3
    } yield (math.min(sigs(i)._1, sigs(j)._1), math.max(sigs(i)._1, sigs(j)._1))).toSet
    val got = Dedup
      .simhashPairs(spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", maxHamming = 3)
      .select($"a", $"b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == truth, s"missed=${truth -- got} extra=${got -- truth}")
  }

  test("ngram jaccard pairs match brute force exactly") {
    import spark.implicits._
    val truth = bruteJaccardPairs(0.8)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(split(lower($"text"), "\\s+")) >= 3)
    val got = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", k = 3, minJaccard = 0.8)
      .select($"a", $"b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == truth, s"missed=${truth -- got} extra=${got -- truth}")
  }

  test("knnBrute equals driver-side brute force; knnLsh recall is sane") {
    import spark.implicits._
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])]
    val all = embs.collect()
    val queries = all.filter(_._1 < 5)
    val k = 5
    val truth = queries.map { case (qid, qv) =>
      qid -> all
        .filter(_._1 != qid)
        .map { case (id, v) => (id, Similarity.cosine(qv, v)) }
        .sortBy(x => (-x._2, x._1))
        .take(k)
        .map(_._1)
        .toSeq
    }.toMap
    val got = Similarity
      .knnBrute(embs, queries, k)
      .collect()
      .groupBy(_.query_id)
      .map { case (q, ns) => q -> ns.sortBy(n => (-n.cosine, n.neighbor_id)).map(_.neighbor_id).toSeq }
    assert(got == truth)

    // LSH with nBits=4 (16 buckets over 500 vectors): recall of top-5 should
    // beat random-bucket baseline comfortably; exactness is not expected
    val lsh = Similarity
      .knnLsh(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id",
        "embedding",
        spark.read.parquet(s"$dir/embeddings.parquet").filter($"vec_id" < 5),
        k,
        nBits = 4
      )
      .select($"qid", $"nid")
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
    val hits = truth.map { case (q, ids) =>
      val found = lsh.getOrElse(q, Array.empty[(Long, Long)]).map(_._2).toSet
      ids.count(found.contains)
    }.sum
    assert(hits > 0, "LSH found none of the true neighbors")
  }

  test("multimodal batch featurize: deterministic, unit-norm, schema intact") {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".as("id"), encode($"text", "utf-8").as("media"), lit("application/fake").as("mime"))
      .as[Multimodal.MediaRow]
    val a = Multimodal.extractFeatures(media).orderBy($"id").collect()
    val b = Multimodal.extractFeatures(media.repartition(7)).orderBy($"id").collect()
    assert(a.length == 500)
    assert(a.map(_.id).sameElements(b.map(_.id)))
    a.zip(b).foreach { case (x, y) =>
      assert(x.width == y.width && x.height == y.height)
      assert(x.features.sameElements(y.features))
      val norm = math.sqrt(x.features.map(f => f.toDouble * f).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"feature norm $norm")
    }
  }

  test("native expressions agree with kernel functions (eval + codegen paths)") {
    import spark.implicits._
    import graft.functions.expressions._
    val df = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    val viaExpr = df.select($"doc_id", fingerprint64($"text").as("fp")).as[(Long, Long)].collect().toMap
    docsLocal.take(50).foreach { case (id, t) =>
      if (viaExpr.contains(id)) assert(viaExpr(id) == TextStats.fingerprint64(t))
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(20)
    val pairs = e.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val viaCos = e.as("x")
      .crossJoin(e.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"), cosine_sim(col("x.embedding"), col("y.embedding")))
      .as[(Long, Long, Double)]
      .collect()
    val m = pairs.toMap
    viaCos.foreach { case (a, b, c) =>
      assert(math.abs(c - Similarity.cosine(m(a), m(b))) < 1e-12)
    }
  }
}
