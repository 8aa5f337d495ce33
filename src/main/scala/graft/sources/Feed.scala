package graft.sources

import graft.functions.Codecs
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, functions => F}

/** RSS/Atom feed ingestion — the other discovery channel next to
  * sitemaps ([[Sitemap]]): feeds surface NEW urls with publish
  * timestamps, the freshness signal a recrawl scheduler wants. Parses
  * RSS 2.0 (`<channel><item><title|link|pubDate>`) and Atom
  * (`<feed><entry><title|link href=|updated>`) in one pass on the same
  * streaming tokenizer as the HTML/sitemap paths — no DOM, lowercase
  * name folding matches both vocabularies case-insensitively, gzip
  * envelopes accepted. Garbage bodies yield empty results, never a
  * throw (one hostile feed must not kill an ingest task).
  *
  * Scale shape: parse is map-only per feed document (explode);
  * downstream joins against the crawled set are the sitemap frontier's
  * shape and reuse it.
  */
object Feed {

  /** One feed entry; `published` null when absent/unparseable; `kind`
    * is "rss" or "atom" (per item, so mixed-namespace bodies stay
    * honest).
    */
  final case class Item(link: String, title: String, published: Timestamp, kind: String)

  /** RSS pubDate is RFC 1123 (day-of-week optional); Atom updated is
    * ISO-8601. Junk becomes null — feeds in the wild hold junk.
    */
  private[graft] def parseDate(s: String): Timestamp = {
    val t = s.trim
    try Timestamp.from(java.time.OffsetDateTime.parse(t).toInstant)
    catch {
      case _: Exception =>
        try Timestamp.from(java.time.ZonedDateTime
          .parse(t, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME).toInstant)
        catch { case _: Exception => null }
    }
  }

  /** CDATA sections are standard RSS practice for titles/links and the
    * tokenizer (correctly, per HTML semantics) discards them — unwrap
    * them to entity-escaped text first, so the content flows through the
    * normal text path and `Entities.decode` restores it verbatim.
    */
  private[graft] def unwrapCdata(text: String): String = {
    if (!text.contains("<![CDATA[")) return text
    val out = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val s = text.indexOf("<![CDATA[", i)
      if (s < 0) { out.append(text, i, text.length); i = text.length }
      else {
        out.append(text, i, s)
        val e = text.indexOf("]]>", s + 9)
        val end = if (e < 0) text.length else e
        var j = s + 9
        while (j < end) {
          text.charAt(j) match {
            case '&' => out.append("&amp;")
            case '<' => out.append("&lt;")
            case '>' => out.append("&gt;")
            case c => out.append(c)
          }
          j += 1
        }
        i = if (e < 0) text.length else e + 3
      }
    }
    out.toString
  }

  /** Parse one feed body (RSS or Atom, gzip-enveloped or not). */
  def parse(body: Array[Byte]): Seq[Item] = {
    if (body == null) return Seq.empty
    val bytes =
      if (Codecs.isGzip(body)) Codecs.gunzip(body).getOrElse(return Seq.empty)
      else body
    val text = unwrapCdata(new String(bytes, StandardCharsets.UTF_8))
    val items = Seq.newBuilder[Item]
    val sink = new graft.functions.html.HtmlTokenizer.Sink {
      private var kind: String = null // "rss" inside <item>, "atom" inside <entry>
      private var field: String = null // "title" | "link" | "pubdate" | "updated"
      private val buf = new java.lang.StringBuilder
      private var link: String = null
      private var title: String = null
      private var published: Timestamp = null

      def text(src: String, s: Int, e: Int): Unit =
        if (field != null) buf.append(src, s, e)

      def startTag(n: String, attrs: List[(String, String)], sc: Boolean): Unit = n match {
        case "item"  => kind = "rss"; link = null; title = null; published = null
        case "entry" => kind = "atom"; link = null; title = null; published = null
        case "link" if kind == "atom" =>
          // Atom: href attribute; prefer rel="alternate" (or no rel) over
          // self/enclosure links, first qualifying wins
          val rel = attrs.collectFirst { case ("rel", v) => v }.getOrElse("alternate")
          if (link == null && rel == "alternate")
            link = attrs.collectFirst { case ("href", v) => v }.map(_.trim).orNull
        case "title" | "link" | "pubdate" | "updated" if kind != null =>
          field = n; buf.setLength(0)
        case _ => ()
      }

      def endTag(n: String): Unit = n match {
        case "title" if field == "title" =>
          title = graft.functions.html.Entities.decode(buf.toString).trim; field = null
        case "link" if field == "link" =>
          if (kind == "rss") link = graft.functions.html.Entities.decode(buf.toString).trim
          field = null
        case "pubdate" if field == "pubdate" =>
          published = parseDate(buf.toString); field = null
        case "updated" if field == "updated" =>
          published = parseDate(buf.toString); field = null
        case "item" | "entry" =>
          if (kind != null && link != null && link.nonEmpty)
            items += Item(link, title, published, kind)
          kind = null
        case _ => ()
      }

      def boundary(): Unit = ()
    }
    graft.functions.html.HtmlTokenizer.tokenizeSink(text, sink)
    items.result()
  }

  /** Explode a feed corpus (feed_url, body) into item rows:
    * (feed_url, link, title, published, kind). Map-only.
    */
  def items(feeds: DataFrame, urlCol: String, bodyCol: String): DataFrame = {
    import feeds.sparkSession.implicits._
    val parseUdf = F.udf((body: Array[Byte]) =>
      parse(body).map(i => (i.link, Option(i.title), Option(i.published), i.kind)))
    feeds
      .select(F.col(urlCol).as("feed_url"), F.explode(parseUdf(F.col(bodyCol))).as("e"))
      .select($"feed_url", $"e._1".as("link"), $"e._2".as("title"),
        $"e._3".as("published"), $"e._4".as("kind"))
  }
}
