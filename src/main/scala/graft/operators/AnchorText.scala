package graft.operators

import graft.functions.html.HtmlLinks
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — the classic off-page signal: what OTHER
  * pages call a url is often a better description than the page itself
  * (search ranking, title synthesis, alias mining). Built from the
  * streaming link harvest ([[HtmlLinks]]) with no DOM and no window
  * functions.
  *
  * Scale shape:
  *   - `links` is map-only (one tokenizer pass per page, explode).
  *   - `topAnchors` is TWO hash aggregations and nothing else:
  *     exact counts per (dst, anchor), then an exact bounded top-k per
  *     dst via [[TopK]]. A `row_number() over (partition by dst)` would
  *     sort EVERY anchor of a hot target (a url the whole web links to)
  *     in one task; the aggregator keeps only k entries per partial
  *     buffer, merges map-side, and is still EXACT because after the
  *     count stage each (dst, anchor) exists exactly once — top-k over
  *     distinct items is a mergeable semilattice, no approximation.
  */
object AnchorText {

  /** Exact top-k of (count, item) pairs per group, bounded at k entries
    * per buffer. Input rows MUST be distinct items (pre-aggregated
    * counts); ordering is (count desc, item asc) so results are total
    * and engine-mirrorable. Output: items in rank order.
    */
  final case class TopK(k: Int)
      extends Aggregator[(String, Long), Seq[(Long, String)], Seq[String]] {
    // rank order: count desc, item asc — total because input items are
    // distinct after the count stage; insertion/merge mechanics live in
    // the shared BoundedTopK core
    private def beats(a: (Long, String), b: (Long, String)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Long, String)] = Seq.empty
    def reduce(b: Seq[(Long, String)], t: (String, Long)): Seq[(Long, String)] =
      BoundedTopK.insert(b, (t._2, t._1), k, beats)
    def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
      BoundedTopK.mergeSorted(a, b, k, beats)
    def finish(r: Seq[(Long, String)]): Seq[String] = r.map(_._2)
    def bufferEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Explode pages into (src, dst, anchor) link rows. `htmlCol` must be
    * decodable as UTF-8 text (caller charsets first when needed).
    */
  def links(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val linkUdf = udf((url: String, html: Array[Byte]) =>
      if (html == null || url == null) Seq.empty[(String, String)]
      else HtmlLinks.extract(new String(html, java.nio.charset.StandardCharsets.UTF_8), url))
    pages
      .select(col(urlCol).as("src"), explode(linkUdf(col(urlCol), col(htmlCol))).as("l"))
      .select(col("src"), col("l._1").as("dst"), col("l._2").as("anchor"))
  }

  /** Per target url: in-link count, distinct anchor count, and the top-k
    * anchor texts by frequency (ties broken lexicographically).
    */
  def topAnchors(links: DataFrame, k: Int): DataFrame = {
    import links.sparkSession.implicits._
    val counts = links.groupBy($"dst", $"anchor").agg(count(lit(1)).as("cnt"))
    val agg = udaf(TopK(k), ExpressionEncoder[(String, Long)]())
    counts.groupBy($"dst")
      .agg(
        sum($"cnt").as("n_inlinks"),
        count(lit(1)).as("n_distinct_anchors"),
        agg($"anchor", $"cnt").as("top_anchors"))
  }
}
