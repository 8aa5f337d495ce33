package graft

import graft.operators.Robots
import graft.operators.Robots.Rule
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-robots")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val body =
    """# corpus robots fixture
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: graftbot
      |Disallow: /private
      |Allow: /private/open
      |
      |User-agent: GRAFTBOT
      |Disallow: /tmp
      |
      |User-agent: *
      |Disallow: /everything
      |Sitemap: https://example.org/sitemap.xml
      |""".stripMargin

  test("group selection: named groups combine, '*' and other agents ignored") {
    val rules = Robots.parse(body, "graftbot")
    assert(rules === Seq(
      Rule(allow = false, "/private"),
      Rule(allow = true, "/private/open"),
      Rule(allow = false, "/tmp")))
    // unknown agent falls back to the '*' group only
    assert(Robots.parse(body, "strangerbot") === Seq(Rule(allow = false, "/everything")))
  }

  test("consecutive UA lines share one group; rules end the run") {
    val b = "User-agent: a\nUser-agent: b\nDisallow: /x\nUser-agent: c\nDisallow: /y\n"
    assert(Robots.parse(b, "a") === Seq(Rule(allow = false, "/x")))
    assert(Robots.parse(b, "b") === Seq(Rule(allow = false, "/x")))
    assert(Robots.parse(b, "c") === Seq(Rule(allow = false, "/y")))
  }

  test("empty Disallow contributes nothing (allow-all); garbage lines skipped") {
    assert(Robots.parse("User-agent: *\nDisallow:\nnoise\n::\nDisallow: /q\n", "x") ===
      Seq(Rule(allow = false, "/q")))
    assert(Robots.parse(null, "x") === Seq.empty)
  }

  test("longest match wins; tie goes to Allow; no match allows") {
    val rules = Seq(
      Rule(allow = false, "/private"),
      Rule(allow = true, "/private/open"),
      Rule(allow = false, "/dup"),
      Rule(allow = true, "/dup"))
    assert(!Robots.evaluate(rules, "/private/7"))
    assert(Robots.evaluate(rules, "/private/open/7"))
    assert(Robots.evaluate(rules, "/dup/3")) // tie -> Allow
    assert(Robots.evaluate(rules, "/public/1")) // unmatched -> allowed
    assert(Robots.evaluate(Seq.empty, "/anything"))
  }

  test("wildcards and end anchors") {
    assert(Robots.matches("/a/*/c", "/a/b/c"))
    assert(Robots.matches("/a/*/c", "/a/b/cd")) // unanchored: prefix-of-tail ok
    assert(!Robots.matches("/a/*/c", "/a/b/d"))
    assert(Robots.matches("/*.pdf$", "/docs/x.pdf"))
    assert(!Robots.matches("/*.pdf$", "/docs/x.pdf?y"))
    assert(Robots.matches("/exact$", "/exact"))
    assert(!Robots.matches("/exact$", "/exactly"))
    assert(Robots.matches("/pre*", "/prefix/anything"))
    assert(Robots.matches("*middle*", "xmiddley"))
    // interior greedy placement must not steal the anchored tail
    assert(Robots.matches("/a*b$", "/ab-b"))
  }

  test("caps: oversized rule lists and bodies are bounded") {
    val big = "User-agent: *\n" +
      (0 until (Robots.MaxRules + 50)).map(i => s"Disallow: /r$i").mkString("\n")
    assert(Robots.parse(big, "x").length === Robots.MaxRules)
  }

  test("allowedPages joins policy by host; absent hosts default-allow") {
    import spark.implicits._
    val pages = Seq(
      ("site1.com", "/p/1", 1L), ("site1.com", "/q/2", 2L),
      ("site2.com", "/private/3", 3L), ("site2.com", "/private/open/4", 4L),
      ("norobots.com", "/anything", 5L)).toDF("host", "path", "id")
    val robots = Seq(
      ("site1.com", "User-agent: graftbot\nDisallow: /\n"),
      ("site2.com", "User-agent: graftbot\nDisallow: /private\nAllow: /private/open\n"))
      .toDF("host", "robots_body")
    val kept = Robots.allowedPages(pages, robots, "host", "path", "robots_body", "graftbot")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(4L, 5L))
  }

  test("sitemaps: non-group records anywhere, dedup, comments, case-insensitive key") {
    val body =
      """User-agent: *
        |Disallow: /private
        |Sitemap: https://h.com/a.xml
        |SITEMAP: https://h.com/b.xml # trailing comment
        |Sitemap: https://h.com/a.xml
        |User-agent: other
        |Sitemap: https://h.com/c.xml
        |""".stripMargin
    assert(Robots.sitemaps(body) ==
      Seq("https://h.com/a.xml", "https://h.com/b.xml", "https://h.com/c.xml"))
    assert(Robots.sitemaps("no directives").isEmpty)
    assert(Robots.sitemaps(null).isEmpty)
  }

  test("crawlDelay: named group beats star, first valid wins, junk values ignored") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 2
        |Crawl-delay: 9
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    assert(Robots.crawlDelay(body, "graftbot") == Some(2))
    assert(Robots.crawlDelay(body, "elsebot") == Some(10))
    val junk =
      """User-agent: *
        |Crawl-delay: soon
        |Crawl-delay: -3
        |Crawl-delay: 7
        |""".stripMargin
    // first VALID value wins; non-numeric/negative are ignored but the
    // group slot stays open until a valid one lands
    assert(Robots.crawlDelay(junk, "anybot") == Some(7))
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /x", "anybot").isEmpty)
    assert(Robots.crawlDelay(null, "anybot").isEmpty)
  }

  test("crawlDelay: zero is 'no delay' (None, so 60/delay callers never divide by 0); fractional rounds up") {
    // a legal "Crawl-delay: 0" must NOT come back as Some(0) — the
    // p_polite_budget cap composition divides a window by the delay
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 0", "anybot").isEmpty)
    // fractional delays are common in the wild; politeness rounds UP
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 0.5", "anybot") == Some(1))
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 2.25", "anybot") == Some(3))
    // zero leaves the group slot open for a later valid value
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 0\nCrawl-delay: 4", "anybot") == Some(4))
  }
}
