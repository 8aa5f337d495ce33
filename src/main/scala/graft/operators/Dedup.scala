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
  *  - SimHash: 64-bit signature, banded into 4×16-bit bucket keys, bucket
  *    self-join + hamming verify (codegen'd Hamming64 expression)
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
  val simhashUdf: UserDefinedFunction = udf((text: String) => TextStats.simhash64(text))
  val shinglesUdf: UserDefinedFunction =
    udf((text: String, k: Int) => TextStats.shingleStrings(text, k))

  /** Exact duplicate groups by content digest: (digest, n, doc_ids).
    * Shuffles only (digest, id) pairs — safe at 10^12 rows.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol)).as("digest"), col(idCol))
      .groupBy("digest")
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  /** MinHash-LSH candidate pairs with estimated Jaccard >= minJaccard.
    * numHashes = bands*rowsPerBand. Returns (a, b, est_jaccard), a < b.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = docs
      .select(col(idCol).as("id"), minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket"))
    val a = banded.select(col("bucket"), col("id").as("a"), col("sig").as("sig_a"))
    val b = banded.select(col("bucket"), col("id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), estJaccardUdf(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
      .groupBy("a", "b") // same pair can match in several bands
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** SimHash near-dup pairs: hamming distance <= maxHamming over banded
    * bucket candidates. A pair is missed only if it differs in all 4 bands —
    * impossible for hamming <= 3, so recall is exact for maxHamming <= 3.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    import graft.functions.expressions.hamming64
    val sigs = docs.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sig"))
    // 4 bands of 16 bits; band index packed to keep buckets disjoint
    val banded = sigs.select(
      col("id"),
      col("sig"),
      explode(
        array((0 until 4).map(i => shiftRightUnsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)) + lit(i.toLong << 17)): _*)
      ).as("bucket")
    )
    val a = banded.select(col("bucket"), col("id").as("a"), col("sig").as("sig_a"))
    val b = banded.select(col("bucket"), col("id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(first("sig_a").as("sig_a"), first("sig_b").as("sig_b"))
      .select(col("a"), col("b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs via shingle inverted index (SQL-mirrorable).
    * jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over DISTINCT word k-grams.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minJaccard: Double = 0.8
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shinglesUdf(col(textCol), lit(k))).as("shingle"))
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh
      .as("x")
      .join(sh.as("y"), col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
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

  /** Embedding near-dup via hyperplane LSH (nBits sign bits from fixed
    * pseudo-random hyperplanes) + exact cosine verify within buckets.
    */
  def embeddingNearDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      nBits: Int = 12
  ): DataFrame = {
    import graft.functions.expressions.cosine_sim
    val sigUdf = udf((v: Seq[Float]) => Similarity.hyperplaneSig(v.toArray, nBits))
    val sigs = embs.select(col(idCol).as("id"), col(vecCol).as("v"), sigUdf(col(vecCol)).as("bucket"))
    val a = sigs.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val b = sigs.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine_sim(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .groupBy("a", "b")
      .agg(max("cosine").as("cosine"))
  }
}
