package graft

import graft.functions.TextRank
import org.scalatest.funsuite.AnyFunSuite

class TextRankSpec extends AnyFunSuite {

  test("sentence split: terminator runs, trailing fragment, no false splits inside tokens") {
    assert(TextRank.sentences("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(TextRank.sentences("Wait... really? yes") == Seq("Wait...", "really?", "yes"))
    // '.' not followed by whitespace does not split (v1.2 etc.)
    assert(TextRank.sentences("version v1.2 shipped. done") == Seq("version v1.2 shipped.", "done"))
    assert(TextRank.sentences("") == Seq.empty)
    assert(TextRank.sentences("   ") == Seq.empty)
  }

  test("k >= sentence count returns the identity summary") {
    val t = "Alpha beta. Gamma delta."
    assert(TextRank.summarize(t, 5) == Seq("Alpha beta.", "Gamma delta."))
  }

  test("the hub sentence (overlapping everything) ranks first; output keeps document order") {
    val t = Seq(
      "Cats drink milk slowly.",
      "Dogs chase cars loudly.",
      "Cats and dogs and birds share the garden daily.", // hub: overlaps all others
      "Birds sing songs sweetly.",
      "Fish swim deep below."
    ).mkString(" ")
    val top2 = TextRank.summarize(t, 2)
    assert(top2.contains("Cats and dogs and birds share the garden daily."))
    // document order, not score order
    assert(top2 == top2.sortBy(s => t.indexOf(s)))
    // deterministic across calls
    assert(TextRank.summarize(t, 2) == top2)
  }

  test("summaries are extractive: every sentence is a substring of the source") {
    val r = new graft.fixtures.Rng(77)
    (0 until 50).foreach { _ =>
      val t = (0 until 12).map(_ => graft.fixtures.Words.sentence(r, r.range(4, 10), 0)).mkString(" ")
      TextRank.summarize(t, 3).foreach(s => assert(t.contains(s)))
    }
  }
}
