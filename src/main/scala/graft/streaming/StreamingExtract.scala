package graft.streaming

import graft.{Extracted, Page}
import graft.operators.ExtractKernel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming surface (SURVEY.md §2.9): the reference is batch-only, and the
  * engine's incremental re-extract is batch-incremental over manifests — but
  * because the extraction kernels are per-row pure, the SAME operator runs
  * unchanged under Structured Streaming. This module wires that up for
  * sources that prefer a continuous pipeline (e.g. a landing directory of
  * parquet crawl batches).
  */
object StreamingExtract {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  /** Continuous extraction over a parquet landing directory. */
  def stream(spark: SparkSession, landingDir: String): Dataset[Extracted] = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .parquet(landingDir)
      .as[Page]
    ExtractKernel.extract(pages)
  }

  /** Continuous extraction INTO the manifest table: each micro-batch becomes
    * one committed snapshot with full lineage, and replayed batches (after a
    * query restart) are skipped by their recorded batch id — exactly-once
    * end to end ([[graft.sources.ManifestTable.commitStreamBatch]]).
    */
  def toManifestTable(
      extracted: Dataset[Extracted],
      root: String,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (Dataset[Extracted], Long) => Unit = (batch, id) => {
      graft.sources.ManifestTable.commitStreamBatch(batch.sparkSession, root, id, batch)
      ()
    }
    extracted.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(fn)
      .start()
  }

  /** Cross-micro-batch streaming dedup on content digest: a page whose html
    * bytes were already seen within the watermark horizon is dropped, state
    * is evicted once the watermark passes (bounded memory — the reason this
    * is `dropDuplicatesWithinWatermark`, not plain `dropDuplicates`, whose
    * state grows forever). The streaming counterpart of
    * [[graft.operators.Dedup.dedupExact]]: a recrawl pipeline dedups inside
    * the ingest stream instead of re-scanning the corpus. Only the 16-byte
    * digest is held in state, never the page itself.
    */
  def dedupStream(pages: Dataset[Page], watermarkDelay: String = "7 days"): Dataset[Page] = {
    import pages.sparkSession.implicits._
    pages
      // unhex packs the digest to its 16 raw bytes — half the state-store
      // key width of the 32-char hex string
      .withColumn("__digest", unhex(md5(col("html"))))
      .withWatermark("warc_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")
      .as[Page]
  }

  /** Windowed per-format throughput metrics with a watermark — the
    * standard late-data-tolerant aggregation over the extraction output.
    */
  def metricsByWindow(extracted: Dataset[Extracted]): DataFrame =
    extracted
      .withWatermark("warc_ts", "1 day")
      .groupBy(window(col("warc_ts"), "1 day"), col("format"))
      .agg(
        count(lit(1)).as("pages"),
        sum(col("n_bytes_in")).as("bytes"),
        sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("failures")
      )
}
