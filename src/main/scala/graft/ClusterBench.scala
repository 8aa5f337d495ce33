package graft

import graft.operators.ExtractKernel
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main for a REAL multi-executor cluster via spark-submit — the
  * north rule's "run via spark-submit on a multi-executor cluster at two
  * cluster sizes" clause, which `Bench`'s forked local[N] JVMs approximate
  * but do not exercise: a standalone master + separate worker JVMs cover
  * task serialization, executor-side classloading of the application jar,
  * the block-manager shuffle transport between executor processes, and the
  * distributed output-commit protocol — none of which exist in local mode.
  *
  * Run by `scripts/cluster_bench.sh` at two cluster sizes (2 workers = N,
  * 8 workers = 4N; fixed 4 cores + fixed heap per executor, so resources
  * scale with executor count exactly as on a real cluster). Three timed
  * legs, median of 3 after an untimed warmup:
  *
  *  - `agg`:   parquet scan → format dispatch → extraction kernels →
  *             sum(length(text)) — the end-to-end throughput headline
  *  - `write`: same kernels → distributed parquet write (real executor-side
  *             commit protocol v1, task files + driver publish)
  *  - `shuffle`: extracted text digests → groupBy(digest) distinct-count —
  *             a full-corpus exchange through the inter-JVM shuffle path
  *  - `cached`: extraction over the executor-cached input (32 balanced
  *             partitions) — the compute-isolated leg; on one box the scan
  *             legs share a single memory bus + virtual disk whose
  *             measured 8→32-thread ceiling is ~0.45 (BENCH.md), so this
  *             is the number comparable to a real cluster where storage
  *             scales with executors
  *
  * Prints ONE line: `GRAFT_CLUSTER_RESULT <nExecutors> <totalCores>
  * <nPages> <agg> <write> <shuffle> <cached> <aggMin> <aggMax> <cachedMin>
  * <cachedMax>` (seconds), parsed by the script into CLUSTER_BENCH.json +
  * the BENCH.md section.
  */
object ClusterBench {

  private def timeIt[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder()
      .appName("graft-cluster-bench")
      // same tuning as Bench.session: splits sized to the few-GB corpus so
      // every core draws work; a real 100 TB run keeps the 128 MB default
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "48m")
      .config("spark.sql.files.openCostInBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val (pages, nPages) = Corpus.benchPages(s, sfDir)

    // wait until the master has delivered every requested executor, so the
    // 2-worker and 8-worker runs each measure their full topology
    val wantCores = s.conf.get("spark.cores.max", "8").toInt
    val deadline = System.nanoTime() + 120e9.toLong
    def executors = s.sparkContext.statusTracker.getExecutorInfos.length - 1 // minus driver
    while (executors * 4 < wantCores && System.nanoTime() < deadline) Thread.sleep(500)
    val nExec = executors

    // page cache + footer warm, JIT warm
    pages.agg(sum(length(col("html")))).collect()
    def runAgg(): Double = timeIt(
      ExtractKernel.extract(pages).agg(sum(length(col("text")))).collect())
    runAgg() // warmup (codegen + kernel JIT on every executor)
    val aggRuns = (1 to 3).map(_ => runAgg())
    val agg = median(aggRuns)

    val sink = java.nio.file.Files.createTempDirectory("graft-cluster-sink").toString
    var w = 0
    def runWrite(): Double = {
      w += 1
      timeIt(ExtractKernel.extract(pages).write.mode("overwrite").parquet(s"$sink/$w"))
    }
    runWrite()
    val write = median((1 to 3).map(_ => runWrite()))

    // full-corpus exchange: one digest row per page through the shuffle
    // service, then the exact distinct count (two-stage hash agg)
    def runShuffle(): Double = timeIt(
      ExtractKernel.extract(pages)
        .select(xxhash64(col("text")).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(col("c")))
        .collect())
    runShuffle()
    val shuffle = median((1 to 3).map(_ => runShuffle()))

    // compute-isolated leg: cache the input ON THE EXECUTORS (columnar,
    // 32 byte-balanced partitions — one wave at 32 cores, four at 8) and
    // extract from the cache, taking the shared-disk scan out of the
    // measurement. Executor memory is sized by the script so the cache
    // fits AT BOTH LEVELS (capacity parity — BENCH.md's equal-memory
    // argument: a real 4N cluster also enjoys 4x cache capacity, so
    // removing the capacity edge is the conservative measurement).
    val cached = pages.repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    cached.count()
    def runCached(): Double = timeIt(
      ExtractKernel.extract(cached).agg(sum(length(col("text")))).collect())
    runCached()
    val cachedRuns = (1 to 5).map(_ => runCached())
    val cachedT = median(cachedRuns)

    println(f"GRAFT_CLUSTER_RESULT $nExec ${nExec * 4} $nPages $agg%.3f $write%.3f $shuffle%.3f " +
      f"$cachedT%.3f ${aggRuns.min}%.3f ${aggRuns.max}%.3f ${cachedRuns.min}%.3f ${cachedRuns.max}%.3f")
    try graft.Fs.deleteRecursively(java.nio.file.Paths.get(sink))
    catch { case _: Exception => () }
    s.stop()
  }
}
