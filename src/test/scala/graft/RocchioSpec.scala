package graft

import graft.operators.Rocchio
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Rocchio centroid-classifier training + inference: hand-computed
  * centroids, tie-breaking, vocabulary cap, null/empty docs, and the
  * brute-force mirror on the driver corpus split.
  */
class RocchioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-rocchio")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "label", "text")

  test("trainCounts aggregates per-class token counts over the top-V vocabulary") {
    val train = df(Seq(
      (1L, "ham", "free free lunch"),
      (2L, "spam", "free pills pills pills")))
    // global counts: free=3, pills=3, lunch=1; topV=2 keeps {free, pills}
    val got = Rocchio.trainCounts(train, "label", "text", topV = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("ham", "free", 2L), ("spam", "free", 1L), ("spam", "pills", 3L)))
  }

  test("classify picks the class with the larger mean token frequency, exactly") {
    val train = df(Seq(
      (1L, "ham", "lunch lunch meeting"),
      (2L, "spam", "pills pills pills offer")))
    val model = Rocchio.buildModel(Rocchio.trainCounts(train, "label", "text", topV = 10))
    assert(model.classes.toSeq === Seq("ham", "spam"))
    // ham total = 3 (lunch=2, meeting=1); spam total = 4 (pills=3, offer=1)
    assert(model.totals.toSeq === Seq(3L, 4L))
    val test = df(Seq(
      (10L, "?", "lunch offer"),   // ham: 2/3 vs spam: 1/4 -> ham
      (11L, "?", "pills meeting"), // ham: 1/3 vs spam: 3/4 -> spam
      (12L, "?", "zzz qqq")))      // no overlap: 0 vs 0 -> tie -> 'ham'
    val pred = Rocchio.classify(test, "text", model)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(pred === Map(10L -> "ham", 11L -> "spam", 12L -> "ham"))
  }

  test("score ties break to the lexicographically smallest class") {
    val train = df(Seq(
      (1L, "b", "tok tok"),
      (2L, "a", "tok tok")))
    val model = Rocchio.buildModel(Rocchio.trainCounts(train, "label", "text", topV = 10))
    val pred = Rocchio.classify(df(Seq((9L, "?", "tok"))), "text", model)
      .select("predicted").as[String].head()
    assert(pred === "a")
  }

  test("null and whitespace-only texts classify deterministically (all-zero tie)") {
    val train = df(Seq((1L, "x", "alpha"), (2L, "y", "beta")))
    val model = Rocchio.buildModel(Rocchio.trainCounts(train, "label", "text", topV = 10))
    val test = Seq((1L, "?", null.asInstanceOf[String]), (2L, "?", "   "))
      .toDF("doc_id", "label", "text")
    val preds = Rocchio.classify(test, "text", model)
      .select("predicted").as[String].collect().toSeq
    assert(preds === Seq("x", "x"))
  }

  test("confusion on the corpus split matches a brute-force local replay") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = d.filter($"doc_id" % 5 === 0)
    val test = d.filter($"doc_id" % 5 =!= 0)
    val got = Rocchio.confusion(train, test, "doc_id", "lang", "text", topV = 50)
      .as[(String, String, Long, Long)].collect().toSeq

    // local brute force with the identical rules
    def toks(t: String): Array[String] =
      if (t == null) Array.empty else t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val trainRows = train.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    trainRows.foreach { case (_, lang, t) =>
      toks(t).foreach(w => cnt((lang, w)) = cnt.getOrElse((lang, w), 0L) + 1L) }
    val vocab = cnt.groupBy(_._1._2).map { case (w, m) => (w, m.values.sum) }
      .toSeq.sortBy { case (w, g) => (-g, w) }.take(50).map(_._1).toSet
    val cv = cnt.filter { case ((_, w), _) => vocab(w) }
    val classes = cv.keys.map(_._1).toSeq.distinct.sorted
    val totals = classes.map(c => c -> cv.collect { case ((`c`, _), n) => n }.sum).toMap
    val exp = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    test.select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      .foreach { case (id, lang, t) =>
        val x = toks(t).groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
        val nums = classes.map(c => c ->
          x.collect { case (w, n) if cv.contains((c, w)) => n * cv((c, w)) }.sum).toMap
        val best = classes.reduceLeft { (b, c) =>
          val (nb, db) = (BigInt(nums(b)), BigInt(math.max(totals(b), 1L)))
          val (ncc, dc) = (BigInt(nums(c)), BigInt(math.max(totals(c), 1L)))
          if (ncc * db > nb * dc) c else b
        }
        val k = (lang, best)
        val (n0, s0) = exp.getOrElse(k, (0L, 0L))
        exp(k) = (n0 + 1L, s0 + id)
      }
    val expSeq = exp.toSeq.map { case ((a, p), (n, s)) => (a, p, n, s) }
      .sortBy(r => (r._1, r._2))
    assert(got === expSeq)
    assert(got.map(_._3).sum === test.count())
  }
}
