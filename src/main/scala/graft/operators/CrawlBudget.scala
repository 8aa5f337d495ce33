package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Politeness-aware crawl budgeting — the frontier-scheduling step of a
  * crawler cycle (Heritrix/Nutch "generate" phase): from a pending
  * frontier, pick at most `perHostCap` urls per host (politeness: a
  * cycle must never hammer one host) and at most `totalBudget` urls
  * overall (fleet capacity), preferring high-priority urls under a
  * total, engine-reproducible order.
  *
  * Scale shape: per-host capping uses a bounded mergeable top-k
  * aggregator, NOT a window — `row_number() OVER (PARTITION BY host)`
  * would sort EVERY pending url of a hot host (the 10^8-url domain) in
  * one task, while the aggregator's partial buffers never exceed
  * `perHostCap` entries and combine map-side. The global cut is
  * orderBy+limit, which Spark plans as TakeOrderedAndProject
  * (per-partition heaps, no global sort). Selection is exact because
  * frontier rows are distinct urls: bounded top-k over distinct items is
  * a mergeable semilattice ([[AnchorText.TopK]] scaladoc).
  */
object CrawlBudget {

  /** Exact bounded top-k of (priority, url) pairs, ordered by
    * (priority DESC, url ASC) — url uniqueness makes the order total.
    * Insertion/merge mechanics live in the shared [[BoundedTopK]] core.
    */
  final case class TopKUrls(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Long, Long)] = Seq.empty
    def reduce(b: Seq[(Long, Long)], t: (Long, Long)): Seq[(Long, Long)] =
      BoundedTopK.insert(b, t, k, beats)
    def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      BoundedTopK.mergeSorted(a, b, k, beats)
    def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  /** Selects the cycle's fetch set from a frontier of distinct urls:
    * per-host top-`perHostCap` by (priority DESC, url ASC), then the
    * global top-`totalBudget` under the same order. Returns
    * (host, url, priority) of the selected urls.
    *
    * All three columns must be long-castable: hosts and urls are the
    * NUMERIC ids of an upstream dictionary (the frontier table a crawler
    * maintains keys urls by id, not by string — string urls would also
    * make the tie-break collation-dependent). Under ANSI mode a
    * non-numeric column fails loudly at the cast.
    */
  def allocate(
      frontier: DataFrame,
      hostCol: String,
      urlCol: String,
      prioCol: String,
      perHostCap: Int,
      totalBudget: Int): DataFrame = {
    require(perHostCap >= 1, s"perHostCap must be >= 1, got $perHostCap")
    require(totalBudget >= 1, s"totalBudget must be >= 1, got $totalBudget")
    import frontier.sparkSession.implicits._
    val topk = udaf(TopKUrls(perHostCap), ExpressionEncoder[(Long, Long)]())
    frontier
      .select(col(hostCol).cast("long").as("host"),
        col(urlCol).cast("long").as("url"), col(prioCol).cast("long").as("priority"))
      .groupBy($"host")
      .agg(topk($"priority", $"url").as("sel"))
      .select($"host", explode($"sel").as("s"))
      .select($"host", $"s._2".as("url"), $"s._1".as("priority"))
      .orderBy($"priority".desc, $"url")
      .limit(totalBudget)
  }

  /** [[allocate]] with PER-HOST caps — the politeness composition: each
    * host's cap comes from its robots `Crawl-delay`
    * ([[Robots.crawlDelay]]; cap = window/delay), so a slow-host budget
    * is enforced at selection time, not fetch time. `caps` carries
    * (hostCol, capCol); hosts absent from it get `defaultCap`. The
    * bounded aggregator runs at `maxCap` (a driver-known bound ≥ every
    * cap — require'd via the caps plan would need an action, so the
    * caller passes it; a cap above maxCap selects maxCap and that
    * truncation would be silent, hence the runtime check on the joined
    * rows), then the per-host rank window runs over at most maxCap rows
    * per host — never the frontier.
    */
  def allocateWithCaps(
      frontier: DataFrame,
      hostCol: String,
      urlCol: String,
      prioCol: String,
      caps: DataFrame,
      capCol: String,
      defaultCap: Int,
      maxCap: Int,
      totalBudget: Int): DataFrame = {
    require(defaultCap >= 1 && maxCap >= 1 && totalBudget >= 1,
      s"bad caps: default=$defaultCap max=$maxCap budget=$totalBudget")
    import frontier.sparkSession.implicits._
    val topk = udaf(TopKUrls(maxCap), ExpressionEncoder[(Long, Long)]())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"host").orderBy($"priority".desc, $"url")
    frontier
      .select(col(hostCol).cast("long").as("host"),
        col(urlCol).cast("long").as("url"), col(prioCol).cast("long").as("priority"))
      .groupBy($"host")
      .agg(topk($"priority", $"url").as("sel"))
      .select($"host", explode($"sel").as("s"))
      .select($"host", $"s._2".as("url"), $"s._1".as("priority"))
      .join(broadcast(caps.select(col(hostCol).cast("long").as("host"),
        col(capCol).cast("int").as("cap"))), Seq("host"), "left")
      .withColumn("cap", coalesce($"cap", lit(defaultCap)))
      .withColumn("__rk", row_number().over(w))
      // guard INSIDE the filter so column pruning can never skip it: a
      // cap above the aggregator bound would otherwise truncate silently
      .filter(
        when($"cap" > lit(maxCap),
          raise_error(concat(lit(s"allocateWithCaps: cap exceeds maxCap=$maxCap for host "),
            $"host".cast("string"))).cast("boolean"))
          .otherwise($"__rk" <= $"cap"))
      .select($"host", $"url", $"priority")
      .orderBy($"priority".desc, $"url")
      .limit(totalBudget)
  }
}
