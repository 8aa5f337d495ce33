package graft

import graft.operators.ExtractKernel
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HostSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("typed Aggregator per-host stats rank the hot host first") {
    import spark.implicits._
    val out = ExtractKernel.extract(Corpus.pages(spark, sfDir))
    def hostOf(url: String): String = {
      val start = url.indexOf("//") + 2
      val end = url.indexOf('/', start)
      if (start < 2 || end < 0) url else url.substring(start, end)
    }
    val rows = out
      .groupByKey(e => hostOf(e.url))
      .agg(graft.operators.Aggregators.extractStats.toColumn.name("stats"))
      .toDF("host", "stats")
      .select($"host", $"stats.pages".as("pages"), $"stats.bytes".as("bytes"))
      .orderBy($"bytes".desc, $"host")
      .limit(10)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.head.getString(0) == graft.fixtures.CorpusGen.HotHost,
      s"hot host should dominate bytes: ${rows.map(_.toString).mkString("\n")}")
    assert(rows.head.getLong(2) > 0)
  }

  test("x_host_skew invariants: aggregator agrees with native SQL aggregates") {
    val row = SparkEntry.queries("x_host_skew")(spark, sfDir).collect().head
    assert(row.getLong(0) == 0L, s"n_host_missing = ${row.getLong(0)}")
    assert(row.getLong(1) == 0L, s"n_stat_mismatch = ${row.getLong(1)}")
    assert(row.getLong(2) == 0L, s"n_internal_bad = ${row.getLong(2)}")
  }
}
