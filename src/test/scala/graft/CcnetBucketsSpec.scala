package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CCNet tercile bucketing: hand-ranked case, zero-token tail placement,
  * per-language independence, small-group tercile arithmetic.
  */
class CcnetBucketsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-ccnet")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("terciles by commonness rate, ranked within language") {
    // 'common' appears 6x -> vocab heavy; docs with more 'common' per token
    // score higher
    val d = Seq(
      (1L, "en", "common common common"),          // rate high -> head
      (2L, "en", "common common filler"),          // middle
      (3L, "en", "rare1 rare2 rare3"),             // low -> tail
      (4L, "fr", "common filler2 filler3"),        // single head of fr? n=2
      (5L, "fr", "zzz yyy xxx")
    ).toDF("doc_id", "lang", "text")
    val got = UnigramLm.ccnetBuckets(d, "doc_id", "text", "lang", topV = 50)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    // en: n=3 -> rk1 head, rk2 middle, rk3 tail by rate order 1 > 2 > 3
    assert(got(1L) === "head")
    assert(got(2L) === "middle")
    assert(got(3L) === "tail")
    // fr: n=2 -> rk*3<=2 never (head empty), rk1 middle (3<=4), rk2 tail
    assert(got(4L) === "middle")
    assert(got(5L) === "tail")
  }

  test("zero-token and null docs land in the tail (rate 0), deterministically") {
    val d = Seq(
      (1L, "en", "common common common"),
      (2L, "en", "common common"),
      (3L, "en", null.asInstanceOf[String]),
      (4L, "en", "   ")
    ).toDF("doc_id", "lang", "text")
    val got = UnigramLm.ccnetBuckets(d, "doc_id", "text", "lang", topV = 50)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    // n=4: rk1 head (3<=4), rk2 middle (6<=8), rk3/rk4 tail
    assert(got(3L) === "tail")
    assert(got(4L) === "tail")
    assert(got(1L) === "head")
  }

  test("every doc gets exactly one bucket and languages are independent") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = UnigramLm.ccnetBuckets(d, "doc_id", "text", "lang", topV = 100)
    assert(out.count() === d.count())
    // within each lang, head <= middle+tail partition sizes differ by <= 1 tercile rule
    val sizes = out.groupBy($"lang", $"bucket").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    sizes.foreach { case (_, m) =>
      val n = m.values.sum
      val h = m.getOrElse("head", 0L)
      assert(h === n / 3) // rk*3 <= n <=> rk <= floor(n/3)
    }
  }
}
