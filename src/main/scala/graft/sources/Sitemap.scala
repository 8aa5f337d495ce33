package graft.sources

import graft.functions.Codecs
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Sitemap ingestion + frontier seeding — how a crawl discovers work.
  * Parses the sitemaps.org protocol: `<urlset>` documents (url entries
  * with `<loc>` and optional `<lastmod>`), `<sitemapindex>` documents
  * (refs to child sitemaps), plain-text sitemaps (one url per line),
  * each optionally gzip-enveloped. The XML walk rides the existing
  * streaming tokenizer ([[graft.functions.html.HtmlTokenizer]]) — the
  * sitemap vocabulary is lowercase by spec, matching the tokenizer's
  * name folding, and no DOM is needed for a two-level element grammar.
  *
  * `frontier` turns parsed entries into crawl work: urls listed by any
  * sitemap, child-index refs resolved ONE level against the provided
  * sitemap corpus (no fetching — this library has no network
  * side-effects; the crawler supplies bodies it already fetched), then
  * split against the crawled table into NEW urls (never fetched) and
  * STALE urls (lastmod strictly newer than the stored warc_ts — the
  * sitemaps.org re-crawl hint). Scale shape: parse is map-only per
  * sitemap document; the child resolution and crawled-set splits are
  * equi-joins on url — the broadcast/shuffle decision is Spark's, and
  * the crawled side is the big one, so the work list (sitemap entries)
  * is the natural build side.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: Timestamp) // lastmod null when absent
  final case class Parsed(urls: Seq[Entry], children: Seq[String])

  /** Accepts W3C datetime as used by sitemaps: date-only `YYYY-MM-DD` or
    * full ISO-8601 with offset. Unparseable values become null (the spec
    * says consumers must tolerate junk).
    */
  private[graft] def parseLastmod(s: String): Timestamp = {
    val t = s.trim
    try {
      if (t.length == 10) Timestamp.valueOf(java.time.LocalDate.parse(t).atStartOfDay())
      else Timestamp.from(java.time.OffsetDateTime.parse(t).toInstant)
    } catch { case _: Exception => null }
  }

  /** Parse one sitemap body (XML urlset / sitemapindex, or plain text;
    * gzip-enveloped or not). Garbage yields an empty Parsed, never a
    * throw — one hostile sitemap must not kill an ingest task.
    */
  def parse(body: Array[Byte]): Parsed = {
    if (body == null) return Parsed(Seq.empty, Seq.empty)
    val bytes =
      if (Codecs.isGzip(body)) Codecs.gunzip(body).getOrElse(return Parsed(Seq.empty, Seq.empty))
      else body
    val text = new String(bytes, StandardCharsets.UTF_8)
    if (!text.contains("<")) {
      // plain-text sitemap: one absolute url per line
      val urls = text.linesIterator.map(_.trim)
        .filter(l => l.startsWith("http://") || l.startsWith("https://"))
        .map(Entry(_, null)).toSeq
      return Parsed(urls, Seq.empty)
    }
    val urls = Seq.newBuilder[Entry]
    val children = Seq.newBuilder[String]
    val sink = new graft.functions.html.HtmlTokenizer.Sink {
      private var inUrl = false // <url> entry
      private var inSitemapRef = false // <sitemap> entry of a sitemapindex
      private var field: String = null // "loc" | "lastmod" while open
      private val buf = new java.lang.StringBuilder
      private var loc: String = null
      private var lastmod: Timestamp = null

      def text(src: String, s: Int, e: Int): Unit =
        if (field != null) buf.append(src, s, e)

      def startTag(n: String, attrs: List[(String, String)], sc: Boolean): Unit = n match {
        case "url"              => inUrl = true; loc = null; lastmod = null
        case "sitemap"          => inSitemapRef = true; loc = null
        case "loc" | "lastmod" if inUrl || inSitemapRef =>
          field = n; buf.setLength(0)
        case _ => ()
      }

      def endTag(n: String): Unit = n match {
        case "loc" if field == "loc" =>
          loc = graft.functions.html.Entities.decode(buf.toString).trim; field = null
        case "lastmod" if field == "lastmod" =>
          lastmod = parseLastmod(buf.toString); field = null
        case "url" =>
          if (inUrl && loc != null && loc.nonEmpty) urls += Entry(loc, lastmod)
          inUrl = false
        case "sitemap" =>
          if (inSitemapRef && loc != null && loc.nonEmpty) children += loc
          inSitemapRef = false
        case _ => ()
      }

      def boundary(): Unit = ()
    }
    graft.functions.html.HtmlTokenizer.tokenizeSink(text, sink)
    Parsed(urls.result(), children.result())
  }

  /** Explode a sitemap corpus (sitemap_url, body) into entry rows:
    * (sitemap_url, loc, lastmod, is_child_ref). Map-only.
    */
  def entries(sitemaps: DataFrame, urlCol: String, bodyCol: String): DataFrame = {
    import sitemaps.sparkSession.implicits._
    val parseUdf = F.udf((body: Array[Byte]) => {
      val p = parse(body)
      p.urls.map(e => (e.loc, Option(e.lastmod), false)) ++
        p.children.map(c => (c, Option.empty[Timestamp], true))
    })
    sitemaps
      .select(F.col(urlCol).as("sitemap_url"), F.explode(parseUdf(F.col(bodyCol))).as("e"))
      .select($"sitemap_url", $"e._1".as("loc"), $"e._2".as("lastmod"),
        $"e._3".as("is_child_ref"))
  }

  /** Crawl frontier: distinct urls listed by the sitemap corpus, labeled
    * against the crawled table — status `new` (never crawled) or
    * `stale` (lastmod strictly newer than the LATEST stored warc_ts —
    * the sitemaps.org re-crawl hint); up-to-date urls are not work and
    * are dropped. When several sitemaps list one url, the greatest
    * lastmod wins (most urgent hint). Child sitemapindex refs need no
    * resolution join: a child sitemap whose body is in the corpus
    * already contributes its entries directly through the parse (refs
    * to unfetched children are unresolvable without network, by
    * design — this library has no network side-effects).
    */
  def frontier(sitemaps: DataFrame, crawled: DataFrame): DataFrame = {
    import sitemaps.sparkSession.implicits._
    val es = entries(sitemaps, "url", "body")
    val listed = es.filter(!$"is_child_ref").select($"loc", $"lastmod")
      .groupBy($"loc").agg(F.max($"lastmod").as("lastmod"))
    // the crawled table may hold MANY snapshots per url; staleness is
    // judged against the latest, else a re-crawled url fans out into one
    // row per snapshot and can be marked stale against an old fetch
    val latestCrawl = crawled.select($"url".as("loc"), $"warc_ts")
      .groupBy($"loc").agg(F.max($"warc_ts").as("warc_ts"))
    val out = listed
      .join(latestCrawl, Seq("loc"), "left")
      .select($"loc", $"lastmod",
        F.when($"warc_ts".isNull, "new")
          .when($"lastmod".isNotNull && $"lastmod" > $"warc_ts", "stale")
          .otherwise("current").as("status"))
      .filter($"status" =!= "current")
    out
  }
}
