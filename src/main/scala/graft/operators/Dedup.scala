package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Deduplication operators for the training-data pipeline tier, each a
  * composable DataFrame transform designed around shuffle discipline:
  *
  *  - exact: one hash-aggregate on a 16-byte digest (never shuffles the
  *    full text at scale — group on md5, carry ids with min/collect)
  *  - MinHash+LSH: shingles → fixed-width signature → band buckets →
  *    bucket-local self-join (the only shuffle is on band keys, whose
  *    fan-out is bounded by `bands`), then signature verify
  *  - SimHash: 64-bit signature over k-gram shingles, pigeonhole-banded
  *    bucket keys with 1-bit multi-probe, bucket self-join + hamming verify
  *    (codegen'd Hamming64 expression)
  *  - exact n-gram Jaccard: shingle inverted index self-join (SQL-mirrorable
  *    for the DuckDB oracle)
  *  - embedding near-dup: hyperplane-LSH buckets + exact cosine verify
  */
object Dedup {

  // UDF wrappers around the pure kernels (array-returning ops can't be
  // plain expressions without more codegen machinery; bodies are tight
  // Scala loops so the UDF boundary is one call per row)
  val minhashUdf: UserDefinedFunction =
    udf((text: String, k: Int, n: Int) => TextStats.minhash(text, k, n))
  val bandKeysUdf: UserDefinedFunction =
    udf((sig: Seq[Long], bands: Int, rows: Int) => TextStats.bandKeys(sig.toArray, bands, rows))
  val estJaccardUdf: UserDefinedFunction =
    udf((a: Seq[Long], b: Seq[Long]) => TextStats.estJaccard(a.toArray, b.toArray))
  val simhashShingleUdf: UserDefinedFunction =
    udf((text: String, k: Int) => TextStats.simhashShingle64(text, k))
  val shinglesUdf: UserDefinedFunction =
    udf((text: String, k: Int) => TextStats.shingleStrings(text, k))

  /** Exact duplicate groups by content digest: (digest, n, doc_ids).
    * Shuffles only (digest, id) pairs — safe at 10^12 rows. The id list is
    * truncated to `maxIds` per group (`n` stays exact): one pathological
    * digest with 10^8 duplicates must not materialize a gigabyte row.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String, maxIds: Int = 100): DataFrame =
    docs
      .select(md5(col(textCol)).as("digest"), col(idCol))
      .groupBy("digest")
      .agg(
        count(lit(1)).as("n"),
        slice(sort_array(collect_list(col(idCol))), 1, maxIds).as("ids")
      )
      .filter(col("n") > 1)

  /** Exact-dedup keep stage: one surviving row (min id) per content digest
    * — the consumable counterpart of [[exactGroups]]. The survivor-id
    * computation shuffles only (digest, id) pairs; the semi join that pulls
    * the survivors' rows broadcasts while the survivor set fits and
    * otherwise shuffles the docs relation once on id — at 10^12 rows the
    * survivor set is O(corpus), so co-locate via an id-bucketed table
    * ([[graft.sources.Bucketing]]) to make that join exchange-free, exactly
    * like the resume anti-join.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      docs.select(md5(col(textCol)).as("digest"), col(idCol))
        .groupBy("digest").agg(min(col(idCol)).as(idCol))
        .select(idCol),
      Seq(idCol), "left_semi")

  /** Drop LSH buckets larger than `maxBucket` before a bucket self-join.
    * A degenerate bucket (e.g. millions of near-empty docs hashing
    * identically) otherwise makes the join quadratic in that bucket; capping
    * trades those candidates away with a documented bound instead of an
    * accidental O(df^2) stall. maxBucket <= 0 disables the cap (exact).
    * Both sides shuffle on the same bucket key, so the count aggregate and
    * the anti-join reuse one exchange.
    */
  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      val hot = banded
        .groupBy("bucket")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > maxBucket)
        .select("bucket")
      banded.join(hot, Seq("bucket"), "left_anti")
    }

  /** MinHash-LSH candidate pairs with estimated Jaccard >= minJaccard.
    * numHashes = bands*rowsPerBand. Returns (a, b, est_jaccard), a < b.
    *
    * Scale levers: recall for true Jaccard j is 1-(1-j^rowsPerBand)^bands —
    * prefer more bands of fewer rows when candidates must not be missed
    * (bands=16, rows=2 gives miss < 1e-7 at j=0.8); `maxBucket` bounds the
    * worst-case bucket self-join (see [[capBuckets]]).
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.5,
      maxBucket: Int = 0
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    // ScanPar: the signature kernel is the per-row hot loop — a single
    // small scan split would serialize it on one core (no-op at scale)
    val sigs = ScanPar(docs)
      .select(col(idCol).as("id"), minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
    val banded = capBuckets(
      sigs.select(col("id"), col("sig"), explode(bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket")),
      maxBucket
    )
    val a = banded.select(col("bucket"), col("id").as("a"), col("sig").as("sig_a"))
    val b = banded.select(col("bucket"), col("id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), estJaccardUdf(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
      .groupBy("a", "b") // same pair can match in several bands
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** MinHash-LSH candidates VERIFIED by exact n-gram Jaccard: the production
    * near-dup pipeline shape (generate-candidates-then-verify). Output is
    * exactly the pairs with true distinct-k-gram Jaccard >= minJaccard that
    * share at least one band bucket; with the default band geometry the miss
    * probability at j=0.8 is < 1e-7 per pair, so on verified corpora this
    * equals the exact [[ngramJaccardPairs]] result while shuffling only band
    * keys + candidate pairs (never the O(df^2) shingle inverted index).
    */
  def minhashVerifiedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.8,
      maxBucket: Int = 0
  ): DataFrame = {
    val cand = minhashPairs(docs, idCol, textCol, shingleK, bands, rowsPerBand,
      minJaccard = 0.0, maxBucket = maxBucket)
      .select(col("a"), col("b"))
    verifyPairsExact(docs, idCol, textCol, cand, shingleK, minJaccard)
  }

  /** Banded MinHash band-key table — the INDEX half of the index-once /
    * probe-per-batch near-dup shape a daily crawl needs: computing the
    * corpus's band keys once, persisting (id, bucket), and probing each new
    * batch against it means a batch of size m costs O(m·bands) band-key
    * lookups instead of re-mining the whole corpus's pair set. The stored
    * rows are (id, bucket) ONLY — candidates go straight to exact-Jaccard
    * verification against the texts, so persisting the full signature per
    * band row would be pure storage amplification (bands× copies of a
    * numHashes-long array that nothing reads). At 10^12 docs persist this
    * bucketed/partitioned on `bucket` so the probe join co-locates without
    * shuffling the index side.
    */
  def minhashIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    ScanPar(docs)
      .select(col(idCol).as("id"),
        minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
      .select(col("id"),
        explode(bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket"))
  }

  /** Probe a NEW batch against a stored [[minhashIndex]]: batch signatures →
    * band keys → equi-join on bucket against the index (never new×new or
    * corpus×corpus) → candidate (a = indexed id, b = new id) pairs → exact
    * distinct-k-gram Jaccard verification against `allDocs` texts. Band
    * geometry must match the index's. `maxBucket` caps INDEX-side hot
    * buckets (boilerplate-heavy shingles) like the batch path does. Output
    * (a, b, jaccard) with jaccard >= minJaccard — with bands=16 x rows=2
    * the per-pair miss probability at j=0.8 is < 1e-7, so this equals the
    * exact cross-set pair definition (which is what the oracle checks).
    */
  def minhashProbeVerified(
      index: DataFrame,
      newDocs: DataFrame,
      allDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.8,
      maxBucket: Int = 0
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val probes = ScanPar(newDocs)
      .select(col(idCol).as("b"),
        minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
      .select(col("b"),
        explode(bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket"))
    val idx = capBuckets(index, maxBucket)
      .select(col("bucket"), col("id").as("a"))
    val cand = idx
      .join(probes, Seq("bucket"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .distinct() // same pair can match in several bands
    verifyPairsExact(allDocs, idCol, textCol, cand, shingleK, minJaccard)
  }

  /** Exact-Jaccard verification of candidate pairs: join texts back to the
    * (a,b) pairs and compute true distinct-k-gram Jaccard per pair. Shuffle
    * cost is O(candidates), not O(corpus^2).
    */
  def verifyPairsExact(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame,
      shingleK: Int,
      minJaccard: Double
  ): DataFrame = {
    val jaccardUdf = udf { (ta: String, tb: String) =>
      val sa = TextStats.shingleStrings(ta, shingleK).toSet
      val sb = TextStats.shingleStrings(tb, shingleK).toSet
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    val t = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    pairs
      .join(t.withColumnRenamed("id", "a").withColumnRenamed("t", "ta"), "a")
      .join(t.withColumnRenamed("id", "b").withColumnRenamed("t", "tb"), "b")
      .select(col("a"), col("b"), jaccardUdf(col("ta"), col("tb")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash near-dup pairs: hamming distance <= maxHamming over banded
    * bucket candidates, EXACT recall by a multi-probe pigeonhole argument.
    *
    * The signature is computed over DISTINCT word k-gram shingles (the same
    * feature set the Jaccard definition uses — see
    * [[TextStats.simhashShingle64]]): unrelated docs then sit near hamming
    * 32 while true near-dups sit well under 16, so a hamming-ball query is
    * a sharp sieve instead of the near-all-pairs one token features give.
    *
    * Banding: B bands of 64/B bits; the probe side emits, per band, the
    * band value plus its `flips` 1-bit neighbors. A pair within hamming h
    * is missed only if EVERY band differs in more than `flips` bits, which
    * needs > B*(flips+1)-1 differing bits — so recall is exact for
    * maxHamming <= B*(flips+1)-1. Config by maxHamming: h<=3 -> 4x16-bit
    * exact bands; h<=7 -> 8x8-bit exact; h<=15 -> 8x8-bit with 1-bit probes
    * (the widest keys that keep the guarantee — 4-bit exact bands would
    * have 16 distinct values per band and degenerate toward all-pairs).
    * The hamming filter runs INSIDE the join stage (codegen'd), so only
    * true-ball pairs reach the dedup aggregate.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 0,
      shingleK: Int = 3
  ): DataFrame =
    hammingPairs64(
      ScanPar(docs).select(
        col(idCol).as("id"),
        simhashShingleUdf(col(textCol), lit(shingleK)).as("sig")
      ),
      maxHamming, maxBucket)

  /** Exact hamming-ball pair mining over ANY 64-bit signature column — the
    * banding core shared by the text simhash pipeline and image-level
    * near-dup over [[graft.functions.PngCodec.aHash64]] fingerprints.
    * `sigs` must be (id: Long "id", sig: Long "sig"); output (a, b,
    * hamming) with a < b and hamming <= maxHamming, recall EXACT by the
    * pigeonhole banding + 1-bit probes argument below.
    */
  def hammingPairs64(
      sigs: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 0
  ): DataFrame = {
    import graft.functions.expressions.hamming64
    require(maxHamming >= 0 && maxHamming <= 15, s"maxHamming $maxHamming outside banding range")
    val (bands, flips) =
      if (maxHamming <= 3) (4, 0)
      else if (maxHamming <= 7) (8, 0)
      else (8, 1)
    val width = 64 / bands
    val mask = (1L << width) - 1L
    // band index packed above the band value to keep buckets disjoint
    val exact = sigs.select(
      col("id"),
      col("sig"),
      explode(
        array((0 until bands).map(i =>
          shiftRightUnsigned(col("sig"), i * width).bitwiseAND(lit(mask)) + lit(i.toLong << 32)): _*)
      ).as("bucket")
    )
    // cap on the BUILD side only: a probe row into a dropped hot bucket
    // simply finds no partner, so one anti-join bounds the whole join
    val b = capBuckets(exact, maxBucket)
      .select(col("bucket"), col("id").as("b"), col("sig").as("sig_b"))
    val probes =
      if (flips == 0) exact
      else {
        val probeUdf = udf { (sig: Long) =>
          val out = new Array[Long](bands * (width + 1))
          var n = 0
          var i = 0
          while (i < bands) {
            val v = (sig >>> (i * width)) & mask
            val tag = i.toLong << 32
            out(n) = v + tag; n += 1
            var f = 0
            while (f < width) { out(n) = (v ^ (1L << f)) + tag; n += 1; f += 1 }
            i += 1
          }
          out
        }
        sigs.select(col("id"), col("sig"), explode(probeUdf(col("sig"))).as("bucket"))
      }
    val a = probes.select(col("bucket"), col("id").as("a"), col("sig").as("sig_a"))
    a.join(b, Seq("bucket"))
      // a<b keeps each unordered pair once; symmetric probing still catches
      // it in both directions, so no pair is order-lost
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("a", "b") // same pair can match in several bands/probes
      .agg(min("hamming").as("hamming"))
  }

  /** SimHash candidates VERIFIED by exact n-gram Jaccard (candidate
    * generation + verification — see [[minhashVerifiedPairs]]). The
    * shingle-feature simhash hamming ball is the candidate sieve; the exact
    * Jaccard filter defines the output. With shingle features a pair at
    * Jaccard j has expected hamming 64·acos(2j/(1+j))/π ≈ 10 at j = 0.8
    * (measured max 12 across the sf0.001-0.1 corpora), so maxHamming = 15
    * bounds the ball with margin while unrelated docs (hamming ≈ 32, min 16
    * measured) never enter it — candidate count stays O(near-dups), and the
    * multi-probe banding in [[simhashPairs]] makes recall within the ball
    * exact, not probabilistic.
    */
  def simhashVerifiedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      shingleK: Int = 3,
      minJaccard: Double = 0.8,
      maxBucket: Int = 0
  ): DataFrame = {
    val cand = simhashPairs(docs, idCol, textCol, maxHamming, maxBucket, shingleK)
      .select(col("a"), col("b"))
    verifyPairsExact(docs, idCol, textCol, cand, shingleK, minJaccard)
  }

  /** Exact n-gram Jaccard pairs via shingle inverted index (SQL-mirrorable).
    * jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over DISTINCT word k-grams.
    *
    * This is the ORACLE-VERIFIER, not the production dedup (that is
    * [[minhashVerifiedPairs]]): the inverted-index self-join is O(df^2) per
    * shingle, so one common 3-gram ("of the and") explodes on real corpora.
    * `maxDf > 0` drops shingles with document frequency > maxDf from BOTH
    * the intersection index and the per-doc universe (Jaccard is then exact
    * over the reduced universe — a deterministic, documented approximation:
    * near-dup pairs at j >= 0.8 share most shingles, and corpus-hot shingles
    * are shared by near-everything, so dropping them barely moves j).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minJaccard: Double = 0.8,
      maxDf: Int = 0
  ): DataFrame = {
    val (counts, inter) = shingleIntersections(docs, idCol, textCol, k, maxDf)
    inter
      .join(counts.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(counts.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(
        col("a"),
        col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard")
      )
      .filter(col("jaccard") >= minJaccard)
  }

  /** Directed shingle-containment pairs: (src, dst, containment) where
    * containment = |shingles(src) ∩ shingles(dst)| / |shingles(src)| — the
    * INCLUSION detector Jaccard structurally misses: a paragraph quoted
    * whole inside a 100× longer page has containment ≈ 1.0 from the quote's
    * side but Jaccard ≈ 1%, so a symmetric near-dup pass keeps both copies.
    * Containment is what quote/boilerplate/syndication detection and
    * leakage auditing (is this eval doc INSIDE a train doc?) actually need
    * (Broder's resemblance-vs-containment distinction, SEQUENCES 1997).
    *
    * Both directions are emitted from ONE undirected intersection pass
    * (same inverted shingle index as [[ngramJaccardPairs]], same O(df^2)
    * caveat and `maxDf` guard — this is likewise the oracle-verifier; the
    * production candidate generator stays MinHash-LSH, whose verify step
    * can compute this ratio instead of Jaccard).
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minContainment: Double = 0.6,
      maxDf: Int = 0
  ): DataFrame = {
    val (counts, inter) = shingleIntersections(docs, idCol, textCol, k, maxDf)
    val fwd = inter
      .join(counts.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .select(col("a").as("src"), col("b").as("dst"),
        (col("inter").cast("double") / col("na")).as("containment"))
    val rev = inter
      .join(counts.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("b").as("src"), col("a").as("dst"),
        (col("inter").cast("double") / col("nb")).as("containment"))
    fwd.unionByName(rev).filter(col("containment") >= minContainment)
  }

  /** Shared core of [[ngramJaccardPairs]] and [[containmentPairs]]: per-doc
    * distinct-shingle counts `(id, n)` and undirected intersection sizes
    * `(a, b, inter)` for a < b, with the optional hot-shingle `maxDf` cut
    * applied to both.
    */
  private def shingleIntersections(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDf: Int
  ): (DataFrame, DataFrame) = {
    // NO ScanPar here (unlike the signature kernels): the exploded
    // shingle stream feeds a groupBy and a self-join whose exchanges
    // already spread the heavy work, and this frame has THREE readers
    // (counts + both self-join sides) — a pre-explode repartition adds
    // an exchange per reader for a UDF that is cheap next to the
    // intersection join (measured: +25% on d_containment, no win).
    val shAll = docs
      .select(col(idCol).as("id"), explode(shinglesUdf(col(textCol), lit(k))).as("shingle"))
    val sh =
      if (maxDf <= 0) shAll
      else {
        val hot = shAll
          .groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf)
          .select("shingle")
        shAll.join(hot, Seq("shingle"), "left_anti")
      }
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh
      .as("x")
      .join(sh.as("y"), col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    (counts, inter)
  }

  /** Connected components over an undirected pair set: (id, component)
    * where component = the minimum doc id reachable from `id`. What a
    * training pipeline actually consumes from near-dup PAIRS is CLUSTERS
    * (keep one representative per cluster) — this is the bridge.
    *
    * Iterative min-label propagation entirely in DataFrames: each round
    * every node takes the min of its own label and its neighbors' labels;
    * converged when no label changes. Rounds needed = graph diameter —
    * near-dup clusters are small and dense (diameter a handful), so the
    * loop is O(few) shuffles of the PAIR set (never the corpus); a
    * pathological 10^6-long chain is capped by maxIter and reported rather
    * than looping forever. No driver-side graph: per-round state is
    * (node, label), shuffled by node id.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Partition-local union-find contraction BEFORE the distributed loop:
    // one map-side pass (zero shuffles) replaces each partition's edge
    // slice with its spanning star forest (node -> partition-local min of
    // its local component). Connectivity is exactly preserved, the edge
    // count drops to <= one edge per distinct node per partition, and
    // locally-connected clusters arrive at the loop already collapsed to
    // depth-1 stars — the loop then only does the cross-partition
    // merging, which pointer jumping finishes in ~log(diameter) rounds
    // over the contracted graph (guide §2.3 "aggregate before you
    // shuffle", applied to connectivity). On a single-box run this cuts
    // the fixpoint to its detection round; at cluster scale it removes
    // the intra-partition duplicate mass from every round's shuffle.
    val star = contractLocal(pairs).cache()
    val edges = star.select(col("a").as("src"), col("b").as("dst"))
      .union(star.select(col("b").as("src"), col("a").as("dst")))
      .cache()
    // Labels SEED from the star (node -> partition-local min), not from
    // self-labels: the contraction already solved every partition-local
    // component, so the loop starts at-or-below the old round-1 state and
    // the single-partition case converges in ONE round (the detection
    // round). The star emits exactly one row per node, so the old
    // distinct() job disappears too; min-monotonicity (the convergence
    // argument) holds from any labels <= self.
    var labels = star.select(col("a").as("id"), col("b").as("comp")).cache()
    // Base sum for the stall test, computed in the job that materializes
    // star + labels — convergence can then be detected on round 1.
    var prevSum: java.math.BigDecimal =
      labels.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var converged = prevSum == null // null sum = zero nodes (empty pairs)
    var iter = 0
    var labelsCkpt = false // round-1 input is cache(), not a checkpoint
    try {
      while (!converged && iter < maxIter) {
        // ONE edge-relax join per round over the edge set EXTENDED with
        // the current labels viewed as edges (comp -> id): relaxing a
        // label edge is exactly the pointer jump (comp(comp(v)) reaches v
        // by transitivity — Shiloach-Vishkin shortcutting), so chains
        // collapse in ~log(diameter) rounds while each round builds ONE
        // join (one broadcast/exchange) instead of the former two.
        val relaxEdges = edges
          .union(labels.select(col("comp").as("src"), col("id").as("dst")))
        val viaAll = relaxEdges
          .join(labels, relaxEdges("src") === labels("id"))
          .select(col("dst").as("id"), col("comp"))
        // EAGER checkpoint every round (the union references `labels`
        // three times, so without truncation the logical plan triples per
        // round). A cache-most-rounds variant that checkpointed only
        // every 3rd round was measured SLOWER (~15-20% on the CC
        // consumers): the cached round's plan misses the adaptive
        // join/partition optimizations the checkpoint path gets — the
        // same pathology measured on the HITS gather. Checkpointed
        // rounds are flat frames; superseded ones are reclaimed by the
        // context cleaner when the reference drops.
        val next = labels.select("id", "comp").union(viaAll)
          .groupBy("id")
          .agg(min("comp").as("comp"))
          .localCheckpoint(true)
        // Convergence test WITHOUT a join: min-propagation is monotone
        // (every node's label is non-increasing round over round), so the
        // label sum is non-increasing and stalls exactly when no label
        // moved — replacing the old next-vs-prev join + count.
        // decimal(38,0) keeps the sum exact past long range at
        // 10^12-node scale.
        val sumNow = next.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
          .head.getDecimal(0)
        if (!labelsCkpt) labels.unpersist()
        labelsCkpt = true
        labels = next
        converged = sumNow == null || prevSum.compareTo(sumNow) == 0
        prevSum = sumNow
        iter += 1
      }
      if (!converged) {
        labels.unpersist()
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds (pathological chain?)")
      }
      // hand back a flat self-contained frame: consuming it never replays
      // the iteration, and its blocks are reclaimed by the context cleaner
      // once the caller drops the reference
      if (!labelsCkpt) {
        val flat = labels.localCheckpoint(true)
        labels.unpersist()
        labels = flat
      }
      labels
    } finally { edges.unpersist(); star.unpersist() }
  }

  /** Partition-local union-find over the (a, b) pair set: emits one star
    * edge (node, localRoot) per distinct node per partition, where
    * localRoot is the MINIMUM id of the node's partition-local component
    * (min-root union + path compression). A spanning star forest per
    * partition has the same connected components as the partition's edge
    * slice, so the union over partitions preserves global connectivity
    * exactly; final labels stay partition-independent because the
    * downstream fixpoint computes the global min per component
    * regardless of how the stars were cut. Memory per task is bounded by
    * the partition's distinct-node count — the same bound the loop's
    * per-round hash aggregation already needs.
    */
  private def contractLocal(pairs: DataFrame): DataFrame = {
    val ss = pairs.sparkSession
    import ss.implicits._
    pairs.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (c != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a)
          val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        val ks = parent.keys.toArray
        ks.iterator.map(n => (n, find(n)))
      }
      .toDF("a", "b")
  }

  /** One representative per duplicate cluster: drops every doc whose
    * component label is a SMALLER doc id (the min-id member survives);
    * singletons pass through untouched. The anti-join right side is only
    * the non-representative ids — O(duplicates), broadcastable in the
    * common case.
    */
  def keepRepresentatives(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dupes = connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(dupes, Seq(idCol), "left_anti")
  }

  /** Keep the BEST-scoring member of every duplicate cluster instead of
    * the min-id one — production pipelines keep the longest / newest /
    * highest-quality duplicate, not an arbitrary label anchor. The winner
    * is argmax of (score, -id): a TOTAL order (ties break to the smallest
    * id), so the kept set is engine-reproducible. Non-clustered docs pass
    * through untouched.
    *
    * Shuffle shape: components over the PAIR set (edges-sized), one
    * max(struct) aggregation keyed on the component (clustered-docs-sized
    * — a tiny fraction of the corpus), and two id-keyed joins back against
    * docs. Never a corpus-wide window sort.
    */
  def keepRepresentativesBy(
      docs: DataFrame, idCol: String, pairs: DataFrame, scoreCol: String): DataFrame =
    keepRepresentativesOf(docs, idCol, connectedComponents(pairs), scoreCol)

  /** [[keepRepresentativesBy]] with precomputed components (id, comp) —
    * callers that already ran [[connectedComponents]] pass them through
    * instead of paying the fixpoint twice.
    */
  def keepRepresentativesOf(
      docs: DataFrame, idCol: String, comps: DataFrame, scoreCol: String): DataFrame = {
    val c = comps.select(col("id").as(idCol), col("comp"))
    val winners = docs
      .select(col(idCol), col(scoreCol))
      .join(c, Seq(idCol))
      .groupBy(col("comp"))
      .agg(max(struct(col(scoreCol).as("s"),
        (-col(idCol)).cast("long").as("negid"))).as("w"))
      .select((-col("w.negid")).as(idCol))
    docs.join(c.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(docs.join(winners, Seq(idCol), "left_semi"))
  }

  /** Embedding near-dup via hyperplane LSH + exact cosine verify within
    * buckets. OR-construction over `tables` independent hash tables (each
    * with its own hyperplane family): a pair collides in at least one table
    * with probability 1-(1-p^nBits)^tables where p = 1 - angle/pi, so recall
    * is tuned by adding tables, not by shrinking nBits (which would make
    * buckets quadratic).
    *
    * Scale rules: nBits >= log2(N / targetBucketSize) keeps bucket joins
    * linear; `maxBucket` hard-bounds the degenerate ones; at minCosine 0.95
    * (production near-dup), nBits=16 x tables=8 gives ~1e-3 miss per pair.
    */
  def embeddingNearDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      nBits: Int = 16,
      tables: Int = 8,
      maxBucket: Int = 0
  ): DataFrame = {
    import graft.functions.expressions.cosine_sim
    val sigUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      Array.tabulate(tables)(t => (t.toLong << 56) | Similarity.hyperplaneSig(a, nBits, seedOffset = t))
    }
    val sigs = capBuckets(
      embs.select(col(idCol).as("id"), col(vecCol).as("v"), explode(sigUdf(col(vecCol))).as("bucket")),
      maxBucket
    )
    val a = sigs.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val b = sigs.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine_sim(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .groupBy("a", "b")
      .agg(max("cosine").as("cosine"))
  }

  /** CCNet-style paragraph-level exact dedup (Wenzek et al. 2020 §4.1 —
    * the standard web-corpus boilerplate killer: cookie banners, nav
    * headers, and legal footers repeat verbatim across millions of pages
    * while the documents around them differ, so document-level dedup
    * never catches them). Segments each doc into fixed-width word
    * "paragraphs" (`TextStats.chunk`, the F13 kernel — this corpus has no
    * newlines; on real pages the segmenter splits on blank lines), keeps
    * only the globally FIRST occurrence of each distinct paragraph
    * (min (docId, position) — deterministic, order-independent), and
    * recomposes every doc from its surviving paragraphs in original order.
    *
    * Returns (idCol, text, n_paras, n_kept): one row per doc that had at
    * least one paragraph; a doc whose every paragraph lost is returned
    * with empty text (n_kept = 0) so the caller can drop or count it.
    *
    * Shuffle discipline — hot paragraphs (the boilerplate this op exists
    * to kill: one paragraph in ~every doc) are exactly the skewed keys,
    * so the winner is computed with a hash AGGREGATE, never a window
    * (a window would sort all 10^12 occurrences of the hot key in one
    * task): groupBy(para).agg(min(id, pos)) partial-aggregates map-side,
    * so the reducer for the hottest key sees at most one partial per
    * input partition. The winner set is then joined back on the UNIQUE
    * (id, pos) keys — uniform, skew-free — never on the paragraph.
    * At 10^12 docs, shrink the aggregate's exchange by grouping on a
    * 128-bit digest of the paragraph instead of the text — same plan,
    * 16-byte keys.
    */
  def dedupParagraphs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      paraWords: Int = 100
  ): DataFrame = {
    val parasUdf = udf((t: String) =>
      if (t == null) Array.empty[String] else TextStats.chunk(t, paraWords).toArray)
    val paras = docs
      .select(col(idCol), posexplode(parasUdf(col(textCol))).as(Seq("pos", "para")))
    // min(struct) compares (id, pos) lexicographically = first occurrence
    val winners = paras
      .groupBy(col("para"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col(s"w.$idCol"), col("w.pos"), lit(true).as("keep"))
    paras
      .join(winners, Seq(idCol, "pos"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // original order restored after the shuffle: collect the kept
        // (pos, para) structs and sort by position before joining
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("para"))))),
            s => s.getField("para")
          ),
          " "
        ).as(textCol)
      )
      .select(col(idCol), col(textCol), col("n_paras"), col("n_kept"))
  }

  /** Span-level (substring) exact dedup at token-gram granularity (Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better"
    * §3 ExactSubstr, discretized to word k-grams): a token is REMOVED iff
    * it is covered by some k-gram occurrence that is not the global first
    * occurrence of that gram (first = min (docId, startPos), deterministic).
    * This kills duplicated runs at ARBITRARY offsets — quotes, chain
    * letters, syndicated sentences — that paragraph-level dedup's fixed
    * boundaries slide past, while the first copy corpus-wide survives
    * intact (its covering grams are all winners).
    *
    * Returns (idCol, textCol, n_tokens, n_removed): one row per input doc;
    * the cleaned text is the surviving tokens re-joined with single spaces
    * (docs shorter than k tokens have no grams and pass through whole).
    *
    * Shuffle discipline mirrors [[dedupParagraphs]]: the duplicated gram IS
    * the skewed key (the point of the operator), so the winner per gram is
    * a two-phase hash AGGREGATE — min(struct(id, pos)) partial-aggregates
    * map-side, bounding the hot gram's reducer to one partial per input
    * partition — and losers are identified by joining winners back on the
    * UNIQUE (id, pos) occurrence key, never by joining on the gram. The
    * exploded gram frame is ~n_tokens rows per doc (overlapping grams);
    * at 10^12 tokens pass `hashGrams = true` to group on xxhash64(gram)
    * instead of the string — identical plan with 8-byte exchange keys
    * instead of ~k-word strings (collision odds ~n²/2⁶⁴ make a false
    * winner astronomically unlikely, and a collision only ever removes a
    * span, never leaks a duplicate). The default string keys keep the
    * DuckDB oracle exact.
    */
  def dedupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 50,
      hashGrams: Boolean = false
  ): DataFrame = {
    val gramsUdf = udf { (t: String) =>
      val ws = if (t == null) Array.empty[String] else TextStats.tokens(t)
      if (ws.length < k) Array.empty[String]
      else Array.tabulate(ws.length - k + 1)(i => ws.slice(i, i + k).mkString(" "))
    }
    val occ = docs.select(col(idCol), posexplode(gramsUdf(col(textCol))).as(Seq("pos", "g")))
    val gramKey = if (hashGrams) xxhash64(col("g")) else col("g")
    val winners = occ
      .groupBy(gramKey.as("gk"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col(s"w.$idCol"), col("w.pos"), lit(true).as("keep"))
    val dupPos = occ
      .join(winners, Seq(idCol, "pos"), "left")
      .filter(col("keep").isNull)
      .groupBy(col(idCol))
      .agg(collect_list(col("pos")).as("dups"))
    // null text passes through as null (same discipline as PiiScrub: a
    // null doc is not an empty doc — downstream null-vs-"" audits must
    // still distinguish them), with zero counts
    val scrubUdf = udf { (t: String, dups: Seq[Int]) =>
      if (t == null) (null: String, 0L, 0L)
      else {
        val ws = TextStats.tokens(t)
        val covered = new Array[Boolean](ws.length)
        dups.foreach { p =>
          var i = p; val end = math.min(p + k, ws.length)
          while (i < end) { covered(i) = true; i += 1 }
        }
        val kept = ws.indices.collect { case i if !covered(i) => ws(i) }
        (kept.mkString(" "), ws.length.toLong, covered.count(identity).toLong)
      }
    }
    docs
      .join(dupPos, Seq(idCol), "left")
      .select(
        col(idCol),
        scrubUdf(col(textCol), coalesce(col("dups"), array().cast("array<int>"))).as("s")
      )
      .select(
        col(idCol),
        col("s._1").as(textCol),
        col("s._2").as("n_tokens"),
        col("s._3").as("n_removed")
      )
  }

  /** Incremental exact dedup of a NEW crawl batch against the EXISTING
    * corpus without ever joining it: the corpus's content digests
    * compress to a Bloom filter (built once per corpus snapshot; at
    * petabyte scale it is persisted next to the manifest and only
    * UNIONED with each batch's filter on commit — Bloom bitsets OR
    * losslessly), and the batch drops rows whose digest is
    * probably-seen. One map-only pass over the batch at ingest, zero
    * corpus-side shuffle per batch — the shape recrawl ingest needs at
    * 10^12 documents, where re-scanning the corpus per batch
    * ([[dedupExact]]) is not an option. Error is ONE-SIDED: a true
    * duplicate is never admitted (no false negatives); `fpp` controls
    * over-drop of genuinely-new rows (~n_new · fpp — size it well below
    * 1/batch for negligible loss).
    */
  def dedupIncrementalBloom(
      corpus: DataFrame,
      batch: DataFrame,
      textCol: String,
      fpp: Double = 1e-6
  ): DataFrame = {
    val digests = corpus.select(md5(col(textCol)).as("dg")).distinct().cache()
    // one bounded sizing pass over DIGESTS (not texts); the cache keeps
    // the sizing count and the filter build from recomputing the shuffle
    val n = math.max(1L, digests.count())
    val bf =
      try digests.stat.bloomFilter("dg", n, fpp)
      finally digests.unpersist()
    val bc = batch.sparkSession.sparkContext.broadcast(bf)
    val seen = udf((dg: String) => dg != null && bc.value.mightContainString(dg))
    // the digest is computed IN-PLAN (codegen'd md5) so the kernel-side
    // and filter-side hex renderings can never diverge
    batch
      .withColumn("__dg", md5(col(textCol)))
      .filter(!seen(col("__dg")))
      .drop("__dg")
  }
}
