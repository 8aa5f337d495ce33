package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HostSkewSpec extends AnyFunSuite {
  test("x_host_skew: typed Aggregator per-host stats run and rank the hot host first") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val rows = SparkEntry.queries("x_host_skew")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.head.getString(0) == graft.fixtures.CorpusGen.HotHost,
      s"hot host should dominate bytes: ${rows.map(_.toString).mkString("\n")}")
    assert(rows.head.getLong(2) > 0)
  }
}
