package graft

import graft.sources.Feed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class FeedSpec extends AnyFunSuite {

  test("RSS: items parsed, channel-level title/link ignored, junk date null") {
    val body =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>My Channel</title><link>https://chan.example.com</link>
        |<item><title>A &amp; B</title><link>https://x.com/1</link>
        |<pubDate>6 Jan 2025 12:30:00 GMT</pubDate></item>
        |<item><title>no date</title><link>https://x.com/2</link>
        |<pubDate>not a date</pubDate></item>
        |</channel></rss>""".stripMargin.getBytes(UTF_8)
    val items = Feed.parse(body)
    assert(items.map(_.link) === Seq("https://x.com/1", "https://x.com/2"))
    assert(items.head.title === "A & B")
    assert(items.head.kind === "rss")
    assert(items.head.published.toInstant.toString === "2025-01-06T12:30:00Z")
    assert(items(1).published === null)
  }

  test("Atom: rel=self skipped, rel-less link wins, ISO date, day-of-week RFC1123 ok") {
    val body =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>chan</title>
        |<entry><title>first</title>
        |<link rel="self" href="https://self.example.com/feed"/>
        |<link href="https://x.com/posts/9"/>
        |<updated>2025-02-03T04:05:06Z</updated></entry>
        |<entry><title>second</title>
        |<link rel="alternate" href="https://x.com/posts/10"/></entry>
        |</feed>""".stripMargin.getBytes(UTF_8)
    val items = Feed.parse(body)
    assert(items.map(_.link) === Seq("https://x.com/posts/9", "https://x.com/posts/10"))
    assert(items.head.kind === "atom")
    assert(items.head.published.toInstant.toString === "2025-02-03T04:05:06Z")
    // RFC 1123 with leading day-of-week also parses
    assert(Feed.parseDate("Mon, 06 Jan 2025 00:00:00 GMT").toInstant.toString
      === "2025-01-06T00:00:00Z")
  }

  test("CDATA-wrapped titles and links unwrap verbatim") {
    val body =
      """<rss><channel><item>
        |<title><![CDATA[Breaking <b>&</b> News]]></title>
        |<link><![CDATA[https://x.com/a?b=1&c=2]]></link>
        |</item></channel></rss>""".stripMargin.getBytes(UTF_8)
    val items = Feed.parse(body)
    assert(items.map(_.link) === Seq("https://x.com/a?b=1&c=2"))
    assert(items.head.title === "Breaking <b>&</b> News")
    // unterminated CDATA must not hang or throw
    assert(Feed.parse("<rss><channel><item><title><![CDATA[oops".getBytes(UTF_8)) === Seq.empty)
  }

  test("gzip envelope and garbage bodies") {
    val body = "<rss><channel><item><title>t</title><link>https://g.com/z</link></item></channel></rss>"
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(body.getBytes(UTF_8)); g.close()
      bos.toByteArray
    }
    assert(Feed.parse(gz).map(_.link) === Seq("https://g.com/z"))
    assert(Feed.parse(null) === Seq.empty)
    assert(Feed.parse(Array[Byte](1, 2, 3)) === Seq.empty)
    assert(Feed.parse("just some text, no xml".getBytes(UTF_8)) === Seq.empty)
    // item without a link is dropped, not emitted half-empty
    val noLink = "<rss><channel><item><title>t</title></item></channel></rss>"
    assert(Feed.parse(noLink.getBytes(UTF_8)) === Seq.empty)
  }
}
