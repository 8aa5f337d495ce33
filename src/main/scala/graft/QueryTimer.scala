package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness for iterating on operator plans
  * without paying a full Bench run: times `SparkEntry.queries(name)` with
  * one untimed warmup and best-of-two timed runs (same protocol as Bench's
  * operator tier), clearing the cache between queries.
  *
  * Usage: runMain graft.QueryTimer <sfDir> <query...>
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTimer <sfDir> <query...>")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-query-timer")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Corpus.pages(spark, sfDir).count()
    for (name <- args.drop(1)) {
      SparkEntry.queries(name)(spark, sfDir).count()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.sharedState.cacheManager.clearCache()
      println(f"QUERY_TIME $name $t%.3f")
    }
    spark.stop()
  }
}
