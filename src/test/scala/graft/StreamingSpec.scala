package graft

import graft.sources.Corpus
import graft.streaming.StreamingExtract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The extraction kernel under Structured Streaming: same results as batch
  * over the same landing data (kernels are per-row pure, SURVEY §2.9).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-streaming")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming extraction == batch extraction over a landing directory") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing").toString
    val pages = Corpus.generate(spark, 200L, 4)
    pages.write.mode("overwrite").parquet(landing)

    val q = StreamingExtract
      .stream(spark, landing)
      .writeStream
      .format("memory")
      .queryName("extracted_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("extracted_stream")
    val batch = graft.operators.ExtractKernel.extract(spark.read.parquet(landing).as[Page])
    assert(streamed.count() == 200L)
    val diff = streamed.select("url", "text").exceptAll(batch.select("url", "text")).count()
    assert(diff == 0L, s"$diff rows differ between streaming and batch")
  }

  test("streaming upsert sink: changed-only commits, latest-wins reads") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing-up").toString
    val root = Files.createTempDirectory("graft-uptable").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt-up").toString
    def page(url: String, day: Int, body: String): Page =
      Page(url, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"),
        body.getBytes("UTF-8"), null, "en")
    val v1 = Seq(page("u/a", 1, "alpha"), page("u/b", 1, "beta"),
      page("u/c", 1, "gamma")).toDS()
    graft.sources.ManifestTable.commitAppend(
      spark, root, graft.operators.ExtractKernel.extract(v1))
    // recrawl lands: u/a unchanged, u/b changed, u/d new
    Seq(page("u/a", 2, "alpha"), page("u/b", 2, "beta CHANGED"),
      page("u/d", 2, "delta")).toDS()
      .write.mode("overwrite").parquet(landing)

    val q = StreamingExtract.toManifestTableUpsert(
      StreamingExtract.stream(spark, landing), root, checkpoint)
    q.processAllAvailable()
    q.stop()

    // history holds 3 originals + ONLY the 2 changed/new recrawl rows
    assert(graft.sources.ManifestTable.read(spark, root).count() === 5L)
    val latest = graft.sources.ManifestTable.readLatest(spark, root)
      .select($"url", $"text").as[(String, String)].collect().toMap
    assert(latest.size === 4)
    assert(latest("u/b").contains("beta CHANGED"))
    assert(latest("u/d").contains("delta"))
    assert(latest("u/a").contains("alpha"))
  }

  test("streaming sink into the manifest table: per-micro-batch snapshots, replay skipped") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing3").toString
    val root = Files.createTempDirectory("graft-streamtable").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val pages = Corpus.generate(spark, 120L, 4)
    pages.write.mode("overwrite").parquet(landing)

    val q = StreamingExtract.toManifestTable(StreamingExtract.stream(spark, landing), root, checkpoint)
    q.processAllAvailable()
    q.stop()

    val table = graft.sources.ManifestTable.read(spark, root)
    assert(table.count() == 120L)
    assert(graft.sources.ManifestTable.committedStreamBatchIds(root).nonEmpty)
    assert(graft.sources.ManifestTable.latestStats(root).map(_.rows).sum > 0)

    // REPLAY: re-committing an already-committed micro-batch id is a no-op
    val someBatch = graft.operators.ExtractKernel.extract(spark.read.parquet(landing).as[Page])
    val replayedId = graft.sources.ManifestTable.committedStreamBatchIds(root).head
    val res = graft.sources.ManifestTable.commitStreamBatch(spark, root, replayedId, someBatch)
    assert(res.isEmpty, "replayed batch id must be skipped")
    assert(graft.sources.ManifestTable.read(spark, root).count() == 120L)

    // a NEW batch id commits normally
    val res2 = graft.sources.ManifestTable.commitStreamBatch(spark, root, 9999L, someBatch.limit(10).as[Extracted])
    assert(res2.nonEmpty)
    assert(graft.sources.ManifestTable.read(spark, root).count() == 130L)
  }

  test("windowed metrics with watermark produce per-day per-format counts") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing2").toString
    Corpus.generate(spark, 150L, 4).write.mode("overwrite").parquet(landing)
    val q = StreamingExtract
      .metricsByWindow(StreamingExtract.stream(spark, landing))
      .writeStream
      .format("memory")
      .queryName("metrics_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    // append mode emits only closed windows; with one batch nothing may be
    // final yet, so assert on the query having run + schema shape
    val df = spark.table("metrics_stream")
    assert(df.columns.toSet == Set("window", "format", "pages", "bytes", "failures"))
  }

  test("streaming dedup drops recrawled duplicate content across micro-batches") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing4").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt-dedup").toString

    val batch1 = Corpus.generate(spark, 80L, 2)
    batch1.write.mode("append").parquet(landing)

    val q = StreamingExtract
      .dedupStream(
        spark.readStream.schema(StreamingExtract.pageSchema).parquet(landing).as[Page],
        watermarkDelay = "3650 days"
      )
      .writeStream
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val afterB1 = spark.table("dedup_stream").count()

    // micro-batch 2: a full recrawl of batch 1 (same html bytes, new urls)
    // plus genuinely new pages — only the new content may come through
    val batch1Urls = batch1.select("url").as[String].collect().toSet
    val recrawl = batch1.withColumn("url", concat(lit("recrawl://"), col("url"))).as[Page]
    val fresh = Corpus.generate(spark, 120L, 2).filter(!col("url").isin(batch1Urls.toSeq: _*))
    recrawl.write.mode("append").parquet(landing)
    fresh.write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_stream")
    val total = out.count()
    // batch-1 digests: exactly one survivor each (the recrawl is dropped)
    val batchDigests = batch1.select(md5(col("html")).as("d")).distinct()
    val survivors = out.select(md5(col("html")).as("d"), col("url"))
      .join(batchDigests, "d").groupBy("d").count()
    assert(survivors.filter(col("count") > 1).count() == 0L,
      "every recrawled digest must appear exactly once downstream")
    assert(afterB1 <= total, "later batches only append")
    // no recrawl:// url may survive for a digest already seen in batch 1
    val dupUrls = out.filter(col("url").startsWith("recrawl://"))
      .select(md5(col("html")).as("d")).join(batchDigests, "d").count()
    assert(dupUrls == 0L, "recrawled duplicates must be dropped by stream dedup")
  }

  test("native session_window streaming agrees with batch Sessionize on the event stream") {
    import spark.implicits._
    // Structured Streaming's session_window is the streaming analog the
    // Sessionize scaladoc names: same 30-min gap rule (boundary nuance:
    // the native window is end-EXCLUSIVE, ours keeps an exactly-gap event in
    // session — indistinguishable on microsecond-random timestamps).
    // Watermark only advances between micro-batches, so two sentinel
    // batches with far-future events flush every real session to the
    // append sink.
    val landing = Files.createTempDirectory("graft-events").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"))
    events.write.mode("overwrite").parquet(landing)

    val q = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .parquet(landing)
      .withWatermark("ts", "0 seconds")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    Seq((-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .toDF("user_id", "ts").write.mode("append").parquet(landing)
    q.processAllAvailable()
    Seq((-1L, java.sql.Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDF("user_id", "ts").write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions_stream")
      .filter($"user_id" >= 0)
      .select($"user_id", $"n_events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().map { case (u, s, e) => u -> ((s, e)) }.toMap
    val batch = graft.operators.Sessionize
      .sessionStats(spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        "user_id", "ts", "event_id", 30L * 60 * 1000000)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().map { case (u, s, e) => u -> ((s, e)) }.toMap
    assert(streamed == batch,
      s"streaming/batch session disagreement: ${(streamed.toSet diff batch.toSet).take(5)}")
  }

  test("stateful flatMapGroupsWithState sessionizer equals batch Sessionize") {
    import spark.implicits._
    import graft.streaming.StreamingExtract.SessEvent
    val landing = Files.createTempDirectory("graft-sessst").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"))
      .write.mode("overwrite").parquet(landing)

    val q = StreamingExtract.sessionizeStateful(
        spark.readStream.schema(spark.read.parquet(landing).schema)
          .parquet(landing).as[SessEvent],
        gapMicros = 30L * 60 * 1000000, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // two sentinel batches: first advances the watermark past every real
    // timeout, second gives the engine a batch in which the timeouts fire
    Seq((-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .toDF("user_id", "ts").write.mode("append").parquet(landing)
    q.processAllAvailable()
    Seq((-1L, java.sql.Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDF("user_id", "ts").write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stateful_sessions")
      .filter($"user_id" >= 0)
      .select($"user_id", $"start_us", $"end_us", $"n_events", $"duration_us")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val batch = graft.operators.Sessionize
      .sessionStats(spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        "user_id", "ts", "event_id", 30L * 60 * 1000000)
      .select($"user_id", $"start_us", $"end_us", $"n_events",
        $"duration_us")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(streamed === batch,
      s"stateful streaming sessions diverge from batch (got ${streamed.length}, want ${batch.length})")
  }

  test("pipeline-tier kernels stream: scrub + classifier equal batch over a landing dir") {
    import spark.implicits._
    import graft.functions.{HashClassifier, PiiScrub, SqlFunctions}
    val landing = Files.createTempDirectory("graft-docs").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        concat($"text", lit(" reach me at a.b@test.org or 415-555-1234")).as("text"))
      .write.mode("overwrite").parquet(landing)
    val scrubUdf = udf((t: String) => PiiScrub.scrub(t).clean)
    val scoreUdf = udf((t: String) =>
      HashClassifier.score(t, SqlFunctions.DefaultGateWeights)._1)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", scrubUdf($"text").as("clean"))
        .select($"doc_id", $"clean", scoreUdf($"clean").as("score"))
    val q = shape(spark.readStream.schema(spark.read.parquet(landing).schema).parquet(landing))
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scrub_stream")
    val batch = shape(spark.read.parquet(landing))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0L,
      "streamed scrub+score rows must equal the batch rows")
  }

  test("stream-stream interval join equals the batch range join, inner and leftOuter") {
    import spark.implicits._
    // requests from the events table; responses derived with a lag of
    // (event_id % 900) seconds under a 600 s maxLag — so matches,
    // too-slow responses (lag 601-899), and lost responses (id % 7 == 0)
    // all occur naturally. leftOuter null rows only emit once the
    // watermark proves no match can arrive: two far-future sentinel
    // batches on BOTH sides advance it (watermarks move between
    // micro-batches).
    val reqDir = Files.createTempDirectory("graft-ssj-req").toString
    val respDir = Files.createTempDirectory("graft-ssj-resp").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"ts".cast("timestamp").as("ts"))
    val reqs = ev.select(
      concat(lit("u/"), $"event_id").as("url"), $"ts".as("req_ts"))
    val resps = ev.filter($"event_id" % 7 =!= 0).select(
      concat(lit("u/"), $"event_id").as("r_url"),
      ($"ts" + expr("make_interval(0,0,0,0,0,0, event_id % 900)")).as("resp_ts"))
    reqs.write.mode("overwrite").parquet(reqDir)
    resps.write.mode("overwrite").parquet(respDir)

    def streamed(joinType: String, name: String) = {
      val q = StreamingExtract.fetchLatency(
          spark.readStream.schema(reqs.schema).parquet(reqDir),
          spark.readStream.schema(resps.schema).parquet(respDir),
          maxLag = "10 minutes", joinType = joinType)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable()
      for (y <- Seq("2030", "2031")) {
        Seq((s"sentinel-$y", java.sql.Timestamp.valueOf(s"$y-01-01 00:00:00")))
          .toDF("url", "req_ts").write.mode("append").parquet(reqDir)
        Seq((s"sentinel-$y", java.sql.Timestamp.valueOf(s"$y-01-01 00:00:00")))
          .toDF("r_url", "resp_ts").write.mode("append").parquet(respDir)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).filter(!$"url".startsWith("sentinel-"))
        .select($"url", $"latency_sec")
    }
    def batch(joinType: String) = StreamingExtract.fetchLatency(
      reqs, resps, maxLag = "10 minutes", joinType = joinType)
      .select($"url", $"latency_sec")

    val inner = streamed("inner", "ssj_inner")
    assert(inner.count() > 0, "inner join must be non-vacuous")
    assert(inner.exceptAll(batch("inner")).count() == 0L
      && batch("inner").exceptAll(inner).count() == 0L,
      "streamed inner interval join must equal the batch join")

    val outer = streamed("leftOuter", "ssj_outer")
    val outerBatch = batch("leftOuter")
    // non-vacuous on BOTH legs: some matches, some null-latency timeouts
    assert(outer.filter($"latency_sec".isNull).count() > 0,
      "leftOuter must surface unmatched requests")
    assert(outer.exceptAll(outerBatch).count() == 0L
      && outerBatch.exceptAll(outer).count() == 0L,
      "streamed leftOuter interval join must equal the batch join")
  }

  test("stateful streaming funnel equals batch, incl. a LATE earlier anchor re-anchoring") {
    import spark.implicits._
    import graft.streaming.FunnelStateful
    val landing = Files.createTempDirectory("graft-funnel").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // batch 1: user 1 views+clicks; user 2 has click+purchase but NO view
    // yet; user 3 clicks only (never anchors -> must emit nothing);
    // user 4 anchors at 100 with a PRE-ANCHOR click at 50 that must be
    // retained, because batch 2 re-anchors user 4 to 30 and the click
    // becomes the step-2 match
    Seq(
      (1L, ts(100), "view"), (1L, ts(200), "click"),
      (2L, ts(50), "click"), (2L, ts(60), "purchase"),
      (3L, ts(100), "click"),
      (4L, ts(100), "view"), (4L, ts(50), "click"))
      .toDF("user_id", "ts", "event_type").write.mode("append").parquet(landing)
    val q = FunnelStateful.funnelStateful(
        spark.readStream.schema(spark.read.parquet(landing).schema)
          .parquet(landing).as[FunnelStateful.FunnelEvent],
        Seq("view", "click", "purchase"), windowMicros = 500L * 1000000L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("stateful_funnel")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: user 2's view arrives LATE with an EARLIER event time (40 s,
    // still above the delayed watermark) and must re-anchor its funnel;
    // user 1 completes with a purchase; user 4 re-anchors to 30, putting
    // the buffered pre-anchor click@50 inside the window
    Seq((2L, ts(40), "view"), (1L, ts(300), "purchase"), (4L, ts(30), "view"))
      .toDF("user_id", "ts", "event_type").write.mode("append").parquet(landing)
    q.processAllAvailable()
    // sentinels: advance the watermark past every anchor+window, then give
    // the engine a batch in which the event-time timeouts fire
    Seq((-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type").write.mode("append").parquet(landing)
    q.processAllAvailable()
    // post-finalization events must NOT start a second funnel (tombstone):
    // user 1 views again long after its window closed
    Seq((1L, java.sql.Timestamp.valueOf("2030-06-01 00:00:00"), "view"),
        (-1L, java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type").write.mode("append").parquet(landing)
    q.processAllAvailable()
    Seq((-1L, java.sql.Timestamp.valueOf("2032-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type").write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stateful_funnel").filter($"user_id" >= 0)
      .select($"user_id", $"reached", $"t1", $"t_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed === Seq(
      (1L, 3L, 100000000L, 300000000L),
      (2L, 3L, 40000000L, 60000000L),
      (4L, 2L, 30000000L, 50000000L)))
    // parity with the batch operator over the same real-event set
    val batch = graft.operators.Funnel.conversion(
        spark.read.parquet(landing)
          .filter($"user_id" >= 0 && $"ts" < ts(1000000)),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        windowMicros = 500L * 1000000L)
      .select($"user", $"reached", $"t1", $"t_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, "streaming funnel must equal the batch operator")
  }
}
