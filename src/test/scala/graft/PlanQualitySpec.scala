package graft

import graft.operators.ExtractKernel
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the "is this the plan you'd want at 100 TB"
  * checks (builder prompt: .explain and iterate):
  *  - the kernel stage must NOT read the golden text column (column pruning
  *    through the PageIn projection)
  *  - the default extract plan must contain NO Exchange (map-only)
  *  - relational queries keep filters pushed to parquet and broadcast the
  *    small dimension side
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-plans")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("extraction scan prunes the golden text column and stays map-only") {
    val pages = Corpus.pages(spark, sfDir)
    val plan = ExtractKernel.extract(pages).queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("html"), s"scan missing html:\n$readSchema")
    assert(!readSchema.contains("text"), s"golden text column NOT pruned:\n$readSchema")
    assert(!plan.contains("Exchange"), s"map-only plan must have no shuffle:\n$plan")
  }

  test("format dispatch predicate is pushed to the parquet scan") {
    import spark.implicits._
    val pages = Corpus.pages(spark, sfDir)
    val q = pages.filter($"lang" === "en").select($"url")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"), s"filter not pushed:\n$plan")
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("html"), s"narrow query must not read html bytes:\n$readSchema")
  }

  test("extract-by-format pushes the STORED format predicate to parquet") {
    import spark.implicits._
    val pages = Corpus.pages(spark, sfDir)
    val q = ExtractKernel.extract(pages.filter($"format" === "html").as[Page])
    val plan = q.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(
      pushed.contains("EqualTo(format,html)"),
      s"format dispatch predicate not pushed to the scan:\n$pushed\n$plan"
    )
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("text"), s"golden text column NOT pruned:\n$readSchema")
  }

  test("dimension join broadcasts the small side") {
    val q = SparkEntry.queries("q_join_revenue")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("decontamination broadcasts the eval gram set (train side never shuffles before the hit count)") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val h = graft.operators.Decontaminate.hits(
      d.filter($"doc_id" % 41 =!= 0), d.filter($"doc_id" % 41 === 0), "doc_id", "text", k = 4)
    val plan = h.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$plan")
    // the only Exchange is the final per-doc hit aggregation, never a join shuffle
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"train-side gram join must not shuffle:\n$plan")
  }

  test("rollup plans as ONE Expand + aggregate, with the nation dim broadcast") {
    val q = SparkEntry.queries("q_rollup")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1, s"rollup must be a single Expand:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"nation dim must broadcast:\n$plan")
  }

  test("resume anti-join is a broadcast hash anti join when the done-set is small") {
    import spark.implicits._
    val pages = Corpus.pages(spark, sfDir)
    val done = pages.filter(pmod(xxhash64($"url"), lit(2)) === 0).select($"url")
    val q = pages.join(broadcast(done), Seq("url"), "left_anti")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), s"plan:\n$plan")
  }

  test("bucketed url tables anti-join with NO exchange (the 10^12-row resume shape)") {
    import spark.implicits._
    val pages = Corpus.pages(spark, sfDir).select($"url", $"warc_ts", $"lang")
    val done = pages.filter(pmod(xxhash64($"url"), lit(2)) === 0).select($"url")
    // a crashed prior run can leave the managed-table location behind with
    // no catalog entry; clear both before writing
    Seq("b_pages", "b_done").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(s"spark-warehouse/$t"))
    }
    graft.sources.Bucketing.writeBucketed(pages, "b_pages", "url", 8)
    graft.sources.Bucketing.writeBucketed(done, "b_done", "url", 8)
    // at sf0.001 the done-set is broadcastable and AQE rightly prefers BHJ;
    // the bucketed-SMJ shape is for the 10^12-row case where NEITHER side
    // broadcasts — simulate by disabling the broadcast thresholds
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val q = graft.sources.Bucketing.bucketedAntiJoin(spark, "b_pages", "b_done", "url")
      q.collect() // finalize AQE
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the right complement
      assert(q.count() == pages.count() - done.count())
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS b_pages")
      spark.sql("DROP TABLE IF EXISTS b_done")
    }
  }

  test("verified-LSH pipeline plans contain no cartesian product") {
    val q = SparkEntry.queries("d_minhash_pairs")(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("whole-stage codegen covers the relational aggregate") {
    val q = SparkEntry.queries("q_agg_pricing")(spark, sfDir)
    q.collect() // finalize the AQE plan first
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("paragraph dedup picks winners with a partial-agg, never a window on the hot key") {
    import spark.implicits._
    // the boilerplate paragraph lands in ~every doc: a Window partitioned
    // by paragraph would sort ALL its occurrences in one task (no partial
    // aggregation, no AQE split). The plan must carry the min(id,pos)
    // winner as a two-phase HashAggregate and zero Window nodes.
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c x y z")).toDF("doc_id", "text")
    val q = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text", paraWords = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-key window in plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"winner not a hash aggregate:\n$plan")
  }

  test("star join broadcasts every dimension; no nested-loop or cartesian joins") {
    val q = SparkEntry.queries("q_star_revenue")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join shape in star plan:\n$plan")
    // supplier, part, nation, region are all hinted broadcast dims
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected >=4 broadcast joins, got $nBroadcast:\n$plan")
  }

  test("span dedup winner is likewise a partial-agg, never a window on the hot gram") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d q")).toDF("doc_id", "text")
    val q = graft.operators.Dedup.dedupSpans(docs, "doc_id", "text", k = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-key window in plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"winner not a hash aggregate:\n$plan")
  }

  test("kwic snippets are map-only: no Exchange anywhere in the plan") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = graft.operators.InvertedIndex
      .kwicSnippets(d, "doc_id", "text", "data", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kwic must not shuffle:\n$plan")
  }

  test("crawl budget never plans a window; global cut is TakeOrdered") {
    import spark.implicits._
    val frontier = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("url"), ($"doc_id" % 23).as("host"),
        (($"doc_id" * 31) % 1000).as("priority"))
    val plan = graft.operators.CrawlBudget
      .allocate(frontier, "host", "url", "priority", 5, 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-host cap must be the bounded aggregator, not a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global budget cut must be TakeOrdered (per-partition heaps):\n$plan")
  }

  test("sketch builds are hash aggregates with map-side partials, no window, no join") {
    import spark.implicits._
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.TextStats.lowerTokensUdf($"text")).as("w"))
    val hll = graft.operators.HllSketch.registers(toks, "w")
      .queryExecution.executedPlan.toString
    val cms = graft.operators.CountMin.table(toks, "w", 4, 256)
      .queryExecution.executedPlan.toString
    for ((name, plan) <- Seq(("hll", hll), ("cms", cms))) {
      assert(plan.contains("HashAggregate") && plan.contains("partial"),
        s"$name register build must partial-aggregate map-side:\n$plan")
      assert(!plan.contains("Window") && !plan.contains("Join"),
        s"$name build must be aggregate-only:\n$plan")
    }
  }

  test("q_range_join's REAL driver plan is BNLJ- and cartesian-free") {
    // the toy-frame assertion in TemporalQuantileSpec can't catch a Catalyst
    // rewrite against the real parquet relations; this pins the actual query
    val plan = SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q_range_join must stay an equi-join on buckets:\n$plan")
  }

  test("q_asof_join's REAL driver plan contains no join operator at all") {
    val plan = SparkEntry.queries("q_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the as-of path must be union+window, never a join:\n$plan")
    assert(plan.contains("Window"), s"expected the running-last window:\n$plan")
  }

  test("winnowing windows partition by document — never a single global partition") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = graft.operators.Winnowing.fingerprints(d, "doc_id", "text", 3, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"winnowing frames must stay doc-local:\n$plan")
    assert(!plan.contains("Join"), s"the rightmost-min pick must not join:\n$plan")
  }

  test("SemDeDup's within-cluster scan is an equi-join on the cluster key, never cartesian") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = graft.operators.SemDedup.seedCentroids(e, "vec_id", "embedding", 0L until 4L)
    val plan = graft.operators.SemDedup
      .semDeDup(e, "vec_id", "embedding", cents, eps = 0.41)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the pair scan must key on cluster:\n$plan")
    assert(plan.contains("LeftSemi"), s"the drop set must be a semi join:\n$plan")
  }

  test("template-line removal joins on (site, line-key) — no cartesian, no window") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "cast(doc_id % 7 as string) as site", "text")
    val plan = graft.operators.Boilerplate
      .stripTemplateLines(d, "doc_id", "site", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"template df/join must stay equi-keyed:\n$plan")
    assert(!plan.contains("Window"),
      s"order restore is a per-doc array_sort, never a window:\n$plan")
  }

  test("DSIR selection is a TakeOrdered, never a global sort exchange") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = new Array[Long](16); t(1) = 2L
    val r = new Array[Long](16); r(1) = 2L; r(2) = 3L
    val plan = graft.operators.Dsir.selectTop(d, "doc_id", "text", t, r, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-n must plan as TakeOrdered:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort shuffle for a bounded selection:\n$plan")
  }

  test("Revisit.changeRates is a single url-Exchange (window and groupBy share partitioning)") {
    import spark.implicits._
    val hist = spark.range(1000)
      .select(($"id" % 50).cast("string").as("url"),
        ($"id" * 86400L).cast("timestamp").as("ts"),
        ($"id" % 7).as("digest"))
    val plan = graft.operators.Revisit.changeRates(hist, "url", "ts", "digest")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"lag window + groupBy on the same key must reuse one Exchange, got $exchanges:\n$plan")
  }

  test("upsert diff's table side prunes to url+text (+window ts), never full rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-planupsert").toString
    try {
      val pages = Corpus.generate(spark, 40, 2)
      graft.operators.ExtractJob.extractAll(pages, root, 2)
      // the exact table-side subplan upsertChanged builds: digests only
      val side = graft.sources.ManifestTable.readLatest(spark, root)
        .select(col("url"), xxhash64(col("text")).as("d"))
      val plan = side.queryExecution.executedPlan.toString
      val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
      assert(readSchema.contains("url") && readSchema.contains("text"),
        s"table side must read url+text:\n$readSchema")
      assert(!readSchema.contains("charset") && !readSchema.contains("n_bytes_in")
        && !readSchema.contains("error"),
        s"full extracted rows must NOT ship through the upsert diff:\n$readSchema")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("classifier inference is map-only after the broadcast model (no Exchange)") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = graft.operators.Rocchio.buildModel(
      graft.operators.Rocchio.trainCounts(d, "lang", "text", topV = 50))
    val q = graft.operators.Rocchio.classify(d, "text", model)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"inference must not shuffle (model rides the closure broadcast):\n$plan")
  }

  test("bitext mining: no cartesian/BNLJ; candidate selection is one window per side") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", concat(lit("https://ex.com/"), $"lang", lit("/p"),
        expr("doc_id div 5").cast("string")))
    val q = graft.operators.Bitext.minePairs(d, "url", "lang", "doc_id", "text",
      "en", "fr", Seq("de", "en", "es", "fr", "zh"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$plan")
    assert(plan.contains("Window"), s"min-id candidate window missing:\n$plan")
  }

  test("CDC chunking is map-only up to the chunk rows (generate, no Exchange)") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val q = graft.operators.Cdc.chunkDocs(d, "text", k = 8, m = 64)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), s"explode missing:\n$plan")
  }

  test("drift monitor: token counts partial-aggregate before the exchange") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = graft.operators.CorpusDrift.tokenDrift(
      d.filter($"doc_id" % 2 === 0), d.filter($"doc_id" % 2 === 1),
      "text", topV = 50, k = 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // two count aggregations, each two-phase: partial_count appears before
    // the shuffle so the exchange ships distinct tokens, not corpus tokens
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"map-side combine missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("KMV sketch build partial-aggregates map-side (exchange ships <=k-long buffers)") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("v")).repartition(4)
    val q = graft.operators.KmvSketch.sketch(d, "v", 64)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the typed Aggregator must run in two phases: a partial
    // ObjectHashAggregate below the exchange (each partition reduces to
    // one <=k buffer) and a merge above — never a single-phase aggregate
    // pulling raw hashes through the shuffle
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"typed aggregate missing:\n$plan")
    assert(plan.contains("partial_kmv") || plan.contains("Partial"),
      s"map-side partial KMV missing — exchange would ship raw hashes:\n$plan")
  }

  test("grouping sets plan is ONE Expand + aggregate, never a union of scans") {
    import spark.implicits._
    val q = graft.SparkEntry.queries("q_grouping_sets")(spark, sfDir)
    q.collect()
    // AQE prints Final AND Initial plans — count nodes in the final only
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Expand".r.findAllIn(plan).size == 1,
      s"grouping sets must expand once:\n$plan")
    // one scan of documents feeds the lattice — a union-of-groupbys
    // shape would scan the fact table once per grouping set
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"grouping sets must not rescan the fact table per set:\n$plan")
  }

  test("stream-stream interval join batch twin broadcasts neither side unboundedly nor goes cartesian") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"event_id", $"ts".cast("timestamp").as("ts"))
    val reqs = ev.select(concat(lit("u/"), $"event_id").as("url"), $"ts".as("req_ts"))
    val resps = ev.select(concat(lit("u/"), $"event_id").as("r_url"),
      ($"ts" + expr("make_interval(0,0,0,0,0,0, event_id % 900)")).as("resp_ts"))
    val q = graft.streaming.StreamingExtract.fetchLatency(reqs, resps, "10 minutes")
    val plan = q.queryExecution.executedPlan.toString
    // equality on url is the join key; the range condition rides as a
    // post-join filter — a missing equi-key would surface as a
    // cartesian/BNLJ and explode at 10^12 events
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay an equi-join on url:\n$plan")
  }

  test("logreg epoch gradient partial-aggregates map-side; inference is map-only codegen") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(($"doc_id" % 2).as("y"), lit(1L).as("x0"), ($"doc_id" % 7).as("x1"))
    // the trainer's per-epoch job shape: a global sum of err·x_i — the
    // exchange must ship ONE partial sum per task, not rows
    val agg = df.agg(sum(expr(
      "(greatest(0L, least(1024L, 512L + (3L*x0 + 2L*x1) div 4L)) - 1024L*y) * x1")))
    val plan = agg.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"gradient sum must partial-aggregate before the exchange:\n$plan")
    // inference over literal weights: pure map, inside codegen, no model join
    val inf = df.select(graft.operators.LogReg.predictExpr(Seq("x0", "x1"), Array(3L, 2L)))
    val iplan = inf.queryExecution.executedPlan.toString
    assert(!iplan.contains("Exchange"), s"inference must be map-only:\n$iplan")
    // "*(n)" is the WholeStageCodegen stage marker in the compact plan string
    assert(iplan.contains("*(1)"), s"inference must codegen:\n$iplan")
  }

  test("structured-meta aggregation: one shuffle on source, partial aggs before it") {
    val q = graft.SparkEntry.queries("t_structured_meta")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"metadata mining must stay map-side:\n$plan")
    // the UDF parse feeds partial aggregates; only the group keys shuffle
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }

  test("funnel: every exchange keys on user; step filters push to the scan; no cartesian") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val q = graft.operators.Funnel.conversion(
      ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
      windowMicros = 86400000000L)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel must not go cartesian:\n$plan")
    // every shuffle in the funnel keys on the user column (groupBy keys
    // t1.. are functionally dependent and satisfied by user partitioning);
    // each step shuffles only its own type-filtered slice
    val exchanges = "Exchange hashpartitioning\\(([a-zA-Z0-9_#]+)".r
      .findAllMatchIn(plan).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(exchanges.subsetOf(Set("user")),
      s"funnel shuffles on non-user keys $exchanges:\n$plan")
    // the step-type predicate reaches the parquet scan
    assert(plan.contains("EqualTo(event_type,view)"),
      s"step filter not pushed to the scan:\n$plan")
  }

  test("k-means assignment is map-only; recentering partial-aggregates before one exchange") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = graft.operators.KMeans.lloydIntGrid(embs, "vec_id", "embedding", k = 4, iters = 2)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the RETURNED frame is assignment only: quantize + argmin UDF over the
    // scan — no Exchange at all (recenter ran in its own bounded jobs)
    assert(!plan.contains("Exchange"),
      s"final assignment must be map-only:\n$plan")
  }

  test("pagination stitch: no cartesian; chain joins and final agg key on the chain columns") {
    val q = graft.SparkEntry.queries("p_paginate_stitch")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"chain resolution must stay keyed:\n$plan")
    // every hash exchange keys on a chain column (edge src/tgt/url, the
    // fsrc out-degree-contract aggregation, or the final head groupBy) —
    // edges-sized shuffles plus ONE corpus-sized exchange on head, nothing
    // keyed on a non-chain column
    val exchanges = "Exchange hashpartitioning\\(([a-zA-Z0-9_#]+)".r
      .findAllMatchIn(plan).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(exchanges.subsetOf(Set("src", "tgt", "url", "head", "dst", "fsrc")),
      s"stitch shuffles on unexpected keys $exchanges:\n$plan")
  }

  test("host gini ranks through the distributed prefix-sum scaffold, not a global sort") {
    val q = graft.SparkEntry.queries("t_host_gini")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the rank window consumes a hash exchange on the scaffold bucket —
    // numParts parallel sorts, never one task sorting every host
    assert(plan.contains("hashpartitioning(__pid"),
      s"gini rank must be bucketed by the scaffold:\n$plan")
    // the only single-partition exchange left is the final 1-row aggregate
    // (numParts partial rows, not data)
    assert("Exchange SinglePartition".r.findAllMatchIn(plan).length <= 1,
      s"unexpected extra SinglePartition exchange:\n$plan")
  }

  test("soft-404 rule is pure codegen (no UDF) with partial aggregation") {
    val q = graft.SparkEntry.queries("t_soft404")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("BatchEvalPython"),
      s"the two-signal rule must be built-in expressions:\n$plan")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }

  test("canonical dedup: one corpus exchange on the declared canonical key") {
    val q = graft.SparkEntry.queries("p_canonical_dedup")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"must stay keyed:\n$plan")
    val exchanges = "Exchange hashpartitioning\\(([a-zA-Z0-9_#]+)".r
      .findAllMatchIn(plan).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(exchanges == Set("canonical"),
      s"expected exactly the canonical-key exchange, got $exchanges:\n$plan")
  }

  test("image/date harvest stays map-only up to its final sort or aggregate") {
    // m_image_pairs: UDF parse + explode + global sort — hash exchanges
    // would mean an accidental join/agg crept into a map-only harvest
    val q1 = graft.SparkEntry.queries("m_image_pairs")(spark, sfDir)
    val p1 = q1.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p1.contains("Exchange hashpartitioning"),
      s"image harvest must not hash-shuffle:\n$p1")
    // p_url_dates: regexp chain must be pure codegen, no UDF at all
    val q2 = graft.SparkEntry.queries("p_url_dates")(spark, sfDir)
    val p2 = q2.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p2.toLowerCase.contains("scalaudf"),
      s"date mining must be built-in expressions:\n$p2")
  }

  test("lexicon tagging is map-only; term rollup broadcasts the term table; split assign is pure codegen") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("free money", "winner", "casino")
    // tagDocs: ONE broadcast automaton pass — no Exchange of any kind
    val tagged = graft.operators.Lexicon.tagDocs(docs, "doc_id", "text", terms)
    val p1 = tagged.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p1.contains("Exchange"), s"lexicon tagging must be map-only:\n$p1")
    // termStats: the tiny term table must come in as a broadcast join, and
    // the hit aggregate must partial-aggregate before its exchange
    val stats = graft.operators.Lexicon.termStats(tagged, terms)
    val p2 = stats.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p2.contains("BroadcastHashJoin"), s"term join must broadcast:\n$p2")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p2).size >= 2,
      s"expected partial+final hit aggregation:\n$p2")
    // holdoutSplit: pure built-in expressions (md5/conv/pmod), no UDF,
    // no Exchange — the split column is free at any scale
    val split = graft.operators.Sampling.holdoutSplit(
      docs.select($"doc_id", $"doc_id".cast("string").as("k")), "k",
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val p3 = split.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p3.contains("Exchange") && !p3.toLowerCase.contains("scalaudf"),
      s"holdout split must be map-only codegen:\n$p3")
  }

  test("today's harvest tier stays map-only up to its final aggregate (no stray joins)") {
    // every one of these is UDF-synthesize -> UDF-mine -> small groupBy:
    // a hash Exchange beyond the final aggregate (or any join except the
    // report's 1-row cross join) means an accidental corpus shuffle
    for (q <- Seq("t_outline", "t_section_chunks", "t_tables", "t_code_blocks",
        "t_truncation", "t_lang_declared", "d_dom_templates",
        "p_pubdate_fuse", "p_robots_directives", "x_warc_headers", "m_exif_meta",
        "m_mp3_meta")) {
      val plan = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        s"$q must not join:\n$plan")
      assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
        s"$q expected partial+final aggregation:\n$plan")
    }
  }

  test("URL-template mine: no UDF, partial aggregation before the template exchange") {
    import spark.implicits._
    val urls = spark.range(0, 1000)
      .select(concat(lit("https://h"), (col("id") % 5).cast("string"),
        lit(".com/p/"), col("id").cast("string")).as("url"))
    val q = graft.operators.UrlPatterns.mineTraps(urls, "url", minDistinct = 10)
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"templatization must be codegen'd expressions, not a UDF:\n$plan")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }

}

/** Driver smoke contract: SparkEntry.entry must return rows. */
class EntrySmokeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("entry() returns a non-empty per-format summary with full match") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(3), s"n != n_match in $r"))
  }
}
