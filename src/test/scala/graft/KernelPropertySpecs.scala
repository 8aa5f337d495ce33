package graft

import graft.functions.TextStats
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the pure text kernels — randomized inputs
  * (including whitespace runs, unicode, and degenerate strings) must never
  * violate the structural contracts the oracles and operators rely on.
  * (No scalatestplus bridge in the offline cache — properties run through
  * scalacheck's own Test runner, failure labels surfaced via the result.)
  */
class KernelPropertySpecs extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val wordGen: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.oneOf("a", "b", "ab", "xyz", "Ü", "日本"))
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(wordGen)
    seps <- Gen.listOfN(math.max(words.size - 1, 0), Gen.oneOf(" ", "  ", "\t", "\n", " \t "))
  } yield words.zipAll(seps :+ "", "", "").map { case (w, s) => w + s }.mkString

  test("BPE segment equals an explicit array-walk applier on arbitrary words and merges") {
    import graft.operators.BpeTrain
    // array-walk reference: explicit greedy left-to-right merge with
    // overlap skipping — deliberately unlike the string-replace kernel
    def refSegment(word: String, merges: Seq[(String, String)]): Array[String] = {
      var syms = word.toLowerCase.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (t1, t2) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == t1 && syms(i + 1) == t2) {
            out += t1 + t2; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      syms
    }
    val wGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    // merges over the same tiny alphabet so they actually fire, chained
    // so later merges can reference earlier merged symbols
    val mGen = Gen.listOfN(4, Gen.zip(
      Gen.oneOf("a", "b", "c", "ab", "bc", "aa"),
      Gen.oneOf("a", "b", "c", "ab", "bc", "aa")))
    check(forAll(wGen, mGen) { (w, ms) =>
      val got = BpeTrain.segment(w, ms).toSeq
      val want = refSegment(w, ms).toSeq
      Prop(got == want) :| s"word=$w merges=$ms got=$got want=$want"
    })
  }

  test("feed CDATA unwrap: content survives the tokenizer round trip verbatim") {
    import graft.sources.Feed
    // payloads include the characters CDATA exists to protect
    val payloadGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.oneOf("&", "<b>", ">", "a&b", "x<y")))
      .map(_.mkString(" ")).suchThat(s => !s.contains("]]>"))
    check(forAll(payloadGen) { p =>
      val body = s"<rss><channel><item><title><![CDATA[$p]]></title>" +
        "<link>https://x.com/1</link></item></channel></rss>"
      val items = Feed.parse(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // the tokenizer collapses whitespace runs in text; CDATA content here
      // is single-spaced so the title must come back verbatim (trimmed)
      Prop(items.nonEmpty && items.head.title == p.trim) :|
        s"payload='$p' got='${items.headOption.map(_.title)}'"
    })
  }

  test("repetitionStats structural invariants hold on arbitrary text") {
    check(forAll(textGen) { t =>
      val r = TextStats.repetitionStats(t)
      val n = TextStats.tokens(t.toLowerCase).length
      val expectedN2 = math.max(n - 1, 0).toLong
      val expectedN3 = if (n < 3) 0L else (n - 2).toLong
      Prop.all(
        Prop(r.length == 4) :| "four slots",
        Prop(r(1) == expectedN2) :| s"n2 must be max(n-1,0): $n -> ${r(1)}",
        Prop(r(3) == expectedN3) :| s"n3 must be n-2 for n>=3: $n -> ${r(3)}",
        Prop(r(0) <= math.max(r(1), 0)) :| "top bigram count bounded by bigram positions",
        Prop(if (n >= 2) r(0) >= 1 else r(0) == 0) :| "top2 >= 1 iff any bigram exists",
        Prop(r(2) <= r(3)) :| "duplicated trigram positions bounded by total",
        Prop(r(2) != 1) :| "dup3 counts full duplicate groups, never a lone position"
      )
    })
  }

  test("wordGrams: no short-doc fallback, distinct, k words per gram") {
    val kGen = Gen.choose(2, 6)
    check(forAll(textGen, kGen) { (t, k) =>
      val ws = TextStats.tokens(t.toLowerCase)
      val g = TextStats.wordGrams(t, k)
      Prop.all(
        Prop(if (ws.length < k) g.isEmpty else g.nonEmpty) :| "empty iff fewer than k tokens",
        Prop(g.length == g.distinct.length) :| "distinct",
        Prop(g.length <= math.max(ws.length - k + 1, 0)) :| "at most n-k+1 grams",
        Prop(g.forall(_.split(" ", -1).length == k)) :| "exactly k space-joined words",
        Prop(g.forall(gram => t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(k)
          .exists(_.mkString(" ") == gram))) :| "every gram is a real window"
      )
    })
  }

  test("repetitionStats is insensitive to whitespace shape and letter case") {
    check(forAll(Gen.listOf(wordGen)) { words =>
      val a = TextStats.repetitionStats(words.mkString(" "))
      val b = TextStats.repetitionStats(words.map(_.toUpperCase).mkString("  \t"))
      Prop(a.toSeq == b.toSeq)
    })
  }
}
