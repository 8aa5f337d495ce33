package graft

import graft.functions.Mojibake
import org.scalatest.funsuite.AnyFunSuite

/** Mojibake repair: exact inversion of k corruption passes, the strict
  * acceptance guards that keep clean text untouched, per-line granularity,
  * and the full byte↔char bijection (cp1252 specials + the five holes).
  */
class MojibakeSpec extends AnyFunSuite {

  test("corrupt shows the classic artifacts") {
    assert(Mojibake.corrupt("café") == "cafÃ©")
    assert(Mojibake.corrupt("it’s") == "itâ€™s")
  }

  test("one corruption pass repairs exactly, depth 1") {
    val originals = Seq(
      "café au lait",
      "it’s — “quoted”… • bullet",
      "naïve résumé ß straße",
      "漢字 kanji mix",
      "emoji 😀 four-byte")
    originals.foreach { o =>
      val (fixed, depth) = Mojibake.fix(Mojibake.corrupt(o))
      assert(fixed == o, s"failed on: $o")
      assert(depth == 1)
    }
  }

  test("double and triple corruption peel off in as many passes") {
    val o = "déjà vu – encore"
    val c2 = Mojibake.corrupt(Mojibake.corrupt(o))
    assert(Mojibake.fix(c2) == ((o, 2)))
    val c3 = Mojibake.corrupt(c2)
    assert(Mojibake.fix(c3) == ((o, 3)))
  }

  test("clean text is untouched: ASCII, legit accents, legit cp1252 punctuation") {
    Seq(
      "plain ascii only",
      "résumé née Zürich",
      "curly ‘quotes’ and — dashes",
      "").foreach { s =>
      assert(Mojibake.fix(s) == ((s, 0)), s"touched: $s")
    }
  }

  test("repair is per line: only the corrupted line changes") {
    val doc = Mojibake.corrupt("première ligne") + "\n" +
      "deuxième ligne propre\nascii line"
    val (fixed, depth) = Mojibake.fix(doc)
    assert(fixed == "première ligne\ndeuxième ligne propre\nascii line")
    assert(depth == 1)
  }

  test("hole bytes (0x81 etc.) round-trip through the sloppy table") {
    // U+0101 LATIN SMALL LETTER A WITH MACRON -> UTF-8 C4 81: byte 0x81 is
    // a cp1252 hole, kept as U+0081 by the sloppy table
    val o = "āēī macrons"
    val c = Mojibake.corrupt(o)
    assert(c.contains(''))
    assert(Mojibake.fix(c) == ((o, 1)))
  }

  test("maxPasses caps the peel and reports the honest depth") {
    val o = "étude"
    val c5 = (1 to 5).foldLeft(o)((s, _) => Mojibake.corrupt(s))
    val (fixed, depth) = Mojibake.fix(c5, maxPasses = 3)
    assert(depth == 3)
    assert(fixed != o) // two layers remain
    assert(Mojibake.fix(fixed, maxPasses = 3) == ((o, 2)))
  }

  test("depth counts the deepest line of a mixed-depth doc") {
    val l1 = Mojibake.corrupt("café")
    val l2 = Mojibake.corrupt(Mojibake.corrupt("thé"))
    assert(Mojibake.fix(l1 + "\n" + l2 + "\nascii") ==
      (("café\nthé\nascii", 2)))
  }

  test("null passes through") {
    assert(Mojibake.fix(null) == ((null, 0)))
  }
}
