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

  /** Streaming RECRAWL ingestion: like [[toManifestTable]], but each
    * micro-batch is a changed-only upsert — rows whose extracted text
    * equals the table's current ([[graft.sources.ManifestTable.readLatest]])
    * row are dropped before the commit, so continuous re-crawls of mostly
    * unchanged pages cost near-zero write amplification while readers see
    * latest-wins supersession. Exactly-once composes: a replayed batch is
    * skipped by its recorded id (and its rows would diff to empty anyway,
    * since the original attempt's commit already published them). The diff
    * is [[graft.operators.ExtractJob.diffChanged]] — one shared helper, so
    * the batch and streaming paths can never disagree about supersession
    * semantics (status-gated: failures never clobber a good row).
    */
  def toManifestTableUpsert(
      extracted: Dataset[Extracted],
      root: String,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (Dataset[Extracted], Long) => Unit = (batch, id) => {
      graft.sources.ManifestTable.commitStreamBatch(
        batch.sparkSession, root, id,
        graft.operators.ExtractJob.diffChanged(batch, root))
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

  /** Open-session state for [[sessionizeStateful]]: integer micros
    * end-to-end, matching [[graft.operators.Sessionize]].
    */
  case class SessState(startUs: Long, endUs: Long, n: Long)

  /** One event of the stateful sessionizer's input stream. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp)

  /** A closed session. */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, duration_us: Long)

  /** Custom-state streaming sessionization via `flatMapGroupsWithState`
    * — the stateful analog of [[graft.operators.Sessionize.sessionStats]]
    * for when the native `session_window` aggregate is not enough (this
    * shape carries arbitrary per-session state and can emit enriched
    * records, not just grouped aggregates). Gap rule identical to batch:
    * an event joins the open session iff its distance to the session's
    * last event is <= gapMicros.
    *
    * State per user is ONE open session (three longs); a session closes
    * and is emitted either when a later event opens the next session or
    * when the event-time timeout fires (watermark passed end + gap — no
    * event can extend it any more, by the watermark contract). Late
    * events beyond the watermark are dropped upstream; late events
    * WITHIN the watermark that arrive after later events were already
    * folded can split differently than batch — the standard streaming
    * sessionization caveat, bounded by the chosen delay.
    *
    * Null-timestamp events are DROPPED (filtered before the watermark):
    * a watermark can neither order nor expire them. This is the one
    * documented deviation from batch [[graft.operators.Sessionize]],
    * which appends null-ts rows to the user's final session; parity
    * claims hold over non-null timestamps.
    */
  def sessionizeStateful(
      events: Dataset[SessEvent],
      gapMicros: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    def close(u: Long, s: SessState): SessionOut =
      SessionOut(u, s.startUs, s.endUs, s.n, s.endUs - s.startUs)
    events
      .filter((e: SessEvent) => e.ts != null)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(user, _))
            state.remove()
            out.iterator
          } else {
            // in-batch sort: the iterator has no order guarantee; volume
            // is per-user-per-micro-batch, not corpus-sized
            val ts = it.map(e => micros(e.ts)).toArray.sorted
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.endUs <= gapMicros =>
                  cur = Some(SessState(s.startUs, math.max(s.endUs, t), s.n + 1))
                case Some(s) =>
                  closed += close(user, s)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once no in-watermark event can extend the session
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMicros / 1000L + 1L)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked STREAM-STREAM interval join — the one Structured
    * Streaming join shape the rest of this surface didn't exercise: a
    * fetch-request stream joined to a fetch-response stream on url with
    * `req_ts <= resp_ts <= req_ts + maxLag` (the crawl-latency monitor;
    * the same shape matches impression/click or schedule/fetch pairing).
    *
    * State discipline at 10^12 events/day: each side buffers rows ONLY
    * until the other side's watermark passes the time-range bound —
    * Spark derives the per-side state horizon from the join condition
    * (requests held for `maxLag` past the response watermark; responses
    * held to the request watermark), so state is O(event rate × lag
    * window), never O(stream history). With `leftOuter`, unmatched
    * requests (response lost or slower than maxLag) emit null-response
    * rows once the watermark proves no match can arrive — exactly the
    * timeout-detection query a crawler health dashboard needs; the nulls
    * arrive with watermark latency, not wall-clock-timer latency.
    *
    * Inputs: `requests(url, req_ts)`, `responses(r_url, resp_ts)` — the
    * response side pre-renamed so the range condition can name both
    * sides unambiguously. Output adds `latency_sec` (null for the
    * unmatched left-outer rows).
    */
  def fetchLatency(
      requests: DataFrame,
      responses: DataFrame,
      maxLag: String,
      watermark: String = "0 seconds",
      joinType: String = "inner"
  ): DataFrame =
    requests.withWatermark("req_ts", watermark)
      .join(
        responses.withWatermark("resp_ts", watermark),
        expr(s"url = r_url AND resp_ts >= req_ts AND resp_ts <= req_ts + interval $maxLag"),
        joinType)
      .select(
        col("url"), col("req_ts"), col("resp_ts"),
        (unix_timestamp(col("resp_ts")) - unix_timestamp(col("req_ts")))
          .as("latency_sec"))

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
