package graft.sources

import graft.Extracted
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-semantics-over-Parquet table (SURVEY.md §7.0): no Iceberg runtime
  * jar exists in this environment, so we emulate the three semantics the
  * north rule needs —
  *
  *  1. **hidden partitioning**: data is written under `data/p_day=YYYY-MM-DD/`
  *     where p_day is DERIVED from warc_ts at write time and stripped from
  *     reads; queries filter on warc_ts and [[prunedRead]] translates the
  *     range to partition-directory pruning (the Catalyst analog: partition
  *     pruning on the directory column).
  *  2. **snapshot manifests**: every commit writes
  *     `_manifests/manifest-<seq>.json` (write-then-atomic-rename) recording
  *     per-partition lineage: p_day → rows/bytes/failures, plus the commit's
  *     warc_ts high watermark. The latest manifest defines table state —
  *     exactly the reference's skip-if-output-exists resume formalized
  *     (main.py:42-44,62-66).
  *  3. **incremental scans**: [[highWatermark]] + a warc_ts filter give
  *     `extract only pages newer than the last snapshot`.
  *
  * The seam is thin by design: a real Iceberg catalog drops in by replacing
  * this object's write/read with `.writeTo(table)` / `read.table`.
  */
object ManifestTable {

  final case class PartitionStat(p_day: String, rows: Long, bytes: Long, failures: Long)

  def dataPath(root: String): String = s"$root/data"
  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")

  /** Append a batch of extraction output as one committed snapshot.
    *
    * Exactly ONE action runs the upstream pipeline (the write) — stats and
    * the high watermark are then derived by re-reading only this commit's
    * rows (filter on the stamped commit_seq, column-pruned to 3 narrow
    * columns), so kernel work is never recomputed, and lineage counts stay
    * exact even under task retries (unlike accumulator-derived counts).
    */
  def commitAppend(spark: SparkSession, root: String, batch: Dataset[Extracted]): Long = {
    import spark.implicits._
    val seq = nextSeq(root)
    batch
      .withColumn("p_day", date_format(col("warc_ts"), "yyyy-MM-dd"))
      .withColumn("commit_seq", lit(seq))
      .write
      .mode(SaveMode.Append)
      .partitionBy("p_day")
      .parquet(dataPath(root))

    // per-partition lineage for THIS commit from the committed files
    val committed = spark.read
      .option("basePath", dataPath(root))
      .parquet(dataPath(root))
      .filter($"commit_seq" === seq)
    val agg = committed
      .groupBy($"p_day".cast("string").as("p_day"))
      .agg(
        count(lit(1)).as("rows"),
        sum($"n_bytes_in").as("bytes"),
        sum(when($"status" =!= "ok", 1L).otherwise(0L)).as("failures"),
        max(unix_timestamp($"warc_ts")).as("hw")
      )
      .collect()
    val stats = agg
      .map(r => PartitionStat(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.p_day)
      .toSeq
    val hw = if (agg.isEmpty) 0L else agg.map(_.getLong(4)).max
    val json = renderManifest(seq, stats, hw)
    val dir = manifestDir(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".manifest-$seq.json.tmp")
    Files.writeString(tmp, json)
    // atomic publish: a crashed writer never leaves a half manifest visible
    Files.move(tmp, dir.resolve(f"manifest-$seq%06d.json"), StandardCopyOption.ATOMIC_MOVE)
    seq
  }

  /** Read full table state (all committed data), hidden column stripped. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val df = spark.read
      .option("basePath", dataPath(root))
      .parquet(dataPath(root))
    df.drop("p_day", "commit_seq")
  }

  /** Read with hidden-partition pruning: a warc_ts day range is translated to
    * p_day directory predicates BEFORE the scan, so only matching partition
    * directories are listed/read — the emulated Iceberg hidden-partitioning
    * benefit (SURVEY.md §4.2).
    */
  def prunedRead(spark: SparkSession, root: String, fromDay: String, toDay: String): DataFrame =
    spark.read
      .option("basePath", dataPath(root))
      .parquet(dataPath(root))
      .filter(col("p_day") >= fromDay && col("p_day") <= toDay)
      .drop("p_day", "commit_seq")

  def exists(root: String): Boolean =
    Files.exists(manifestDir(root)) && latestManifest(root).isDefined

  /** Committed url set for resume (anti-join right side). */
  def committedUrls(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    if (exists(root)) read(spark, root).select("url")
    else spark.createDataset(Seq.empty[String]).toDF("url")
  }

  /** High watermark (max committed warc_ts, epoch seconds) across manifests. */
  def highWatermark(root: String): Option[Long] = {
    val ms = listManifests(root)
    if (ms.isEmpty) None
    else Some(ms.map(p => parseHw(Files.readString(p))).max)
  }

  /** Per-partition lineage of the latest snapshot (for audits/tests). */
  def latestStats(root: String): Seq[PartitionStat] =
    latestManifest(root).toSeq.flatMap(p => parseStats(Files.readString(p)))

  // ---- manifest encoding (hand-rolled JSON; no external deps) ------------

  private def renderManifest(seq: Long, stats: Seq[PartitionStat], hw: Long): String = {
    val parts = stats
      .map(s => s"""    {"p_day":"${s.p_day}","rows":${s.rows},"bytes":${s.bytes},"failures":${s.failures}}""")
      .mkString(",\n")
    s"""{
  "sequence": $seq,
  "high_watermark_epoch_s": $hw,
  "total_rows": ${stats.map(_.rows).sum},
  "total_bytes": ${stats.map(_.bytes).sum},
  "total_failures": ${stats.map(_.failures).sum},
  "partitions": [
$parts
  ]
}"""
  }

  private def listManifests(root: String): Seq[Path] = {
    val dir = manifestDir(root)
    if (!Files.exists(dir)) Seq.empty
    else
      Files.list(dir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("manifest-\\d+\\.json"))
        .sortBy(_.getFileName.toString)
  }

  private def latestManifest(root: String): Option[Path] = listManifests(root).lastOption

  private def nextSeq(root: String): Long =
    latestManifest(root)
      .map(_.getFileName.toString.stripPrefix("manifest-").stripSuffix(".json").toLong + 1)
      .getOrElse(0L)

  private val hwRe = """"high_watermark_epoch_s":\s*(\d+)""".r
  private val partRe =
    """\{"p_day":"([0-9-]+)","rows":(\d+),"bytes":(\d+),"failures":(\d+)\}""".r

  private def parseHw(json: String): Long =
    hwRe.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)

  private def parseStats(json: String): Seq[PartitionStat] =
    partRe.findAllMatchIn(json).map(m => PartitionStat(m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)).toSeq
}
