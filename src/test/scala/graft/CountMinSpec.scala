package graft

import graft.operators.CountMin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-cms")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("estimates upper-bound true counts and are exact without collisions") {
    import spark.implicits._
    // genuinely skewed stream: 3 hot items carry 3/4 of the mass, 97
    // cold items share the rest — over-estimation pressure on cold
    // items colliding with hot cells is the regime worth covering
    val stream = (0 until 2000).map(i =>
      if (i % 4 != 0) s"hot-${i % 3}" else s"cold-${i % 97}")
    val df = stream.toDF("v")
    val cells = CountMin.table(df, "v", depth = 4, width = 256).cache()
    val truth = stream.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val probes = truth.keys.toSeq.toDF("p")
    val est = CountMin.estimate(cells, probes, "p", 4, 256)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (v, n) =>
      assert(est(v) >= n, s"$v: est ${est(v)} < true $n")
    }
    // total mass conservation: each row's cells sum to the stream length
    val perRow = cells.groupBy($"row").sum("cnt")
      .as[(Int, Long)].collect().toMap
    assert(perRow.values.toSet === Set(stream.length.toLong))
    // absent probe estimates are deterministic and >= 0
    val absent = CountMin.estimate(cells, Seq("never-seen").toDF("p"), "p", 4, 256)
      .as[(String, Long)].collect().head._2
    assert(absent >= 0L)
  }

  test("merge of slice tables equals the whole-stream table") {
    import spark.implicits._
    val vals = (0 until 1000).map(i => s"w${i % 90}")
    val whole = CountMin.table(vals.toDF("v"), "v", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val (a, b) = vals.splitAt(400)
    val merged = CountMin.merge(
      CountMin.table(a.toDF("v"), "v", 4, 64),
      CountMin.table(b.toDF("v"), "v", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }
}
