package graft

import graft.functions.html.MetaRobots
import org.scalatest.funsuite.AnyFunSuite

/** Parse semantics of the robots META directive extractor — the in-page
  * half of robots exclusion (robots.txt semantics live in RobotsSpec).
  */
class MetaRobotsSpec extends AnyFunSuite {

  private def p(h: String) = MetaRobots.parse(h)

  test("plain directives, case- and whitespace-insensitive, unknown ignored") {
    assert(p("""<head><meta name="robots" content="noindex"></head>""")
      == MetaRobots.Directives(noindex = true, nofollow = false))
    assert(p("""<head><meta name="ROBOTS" content=" NOFOLLOW , noarchive "></head>""")
      == MetaRobots.Directives(noindex = false, nofollow = true))
    assert(p("""<head><meta name=" robots " content="NONE"></head>""")
      == MetaRobots.Directives(noindex = true, nofollow = true))
    assert(p("""<head><meta name="robots" content="noarchive, nosnippet"></head>""")
      == MetaRobots.Directives(noindex = false, nofollow = false))
  }

  test("multiple tags combine restrictively") {
    assert(p("""<head><meta name="robots" content="nofollow">
                |<meta name="robots" content="noindex"></head>""".stripMargin)
      == MetaRobots.Directives(noindex = true, nofollow = true))
  }

  test("only head-region robots tags with name=robots apply") {
    // body placement is ignored (engine behavior), whether the head is
    // closed explicitly or implied by <body>
    assert(p("""<head></head><body><meta name="robots" content="noindex"></body>""")
      == MetaRobots.Directives(noindex = false, nofollow = false))
    assert(p("""<body><meta name="robots" content="noindex"></body>""")
      == MetaRobots.Directives(noindex = false, nofollow = false))
    // name mismatch and missing attrs are inert
    assert(p("""<head><meta name="description" content="noindex"></head>""")
      == MetaRobots.Directives(noindex = false, nofollow = false))
    assert(p("""<head><meta name="robots"></head>""")
      == MetaRobots.Directives(noindex = false, nofollow = false))
    // head-less fragments honor directives before any body/head close
    assert(p("""<meta name="robots" content="noindex"><p>text</p>""")
      == MetaRobots.Directives(noindex = true, nofollow = false))
  }

  test("empty and tagless inputs admit") {
    assert(p("") == MetaRobots.Directives(noindex = false, nofollow = false))
    assert(p("<html><head><title>t</title></head><body>hi</body></html>")
      == MetaRobots.Directives(noindex = false, nofollow = false))
  }
}
