package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Lexicon

class LexiconSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("lexicon-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def countAll(text: String, terms: Seq[String],
      wordBounds: Boolean = true, asciiFold: Boolean = true): Map[String, Int] = {
    val a = Lexicon.compile(terms, asciiFold)
    val counts = new Array[Int](a.nTerms)
    val touched = new Array[Int](a.nTerms)
    val nt = a.countInto(text, wordBounds, asciiFold, counts, touched)
    val m = (0 until nt).map { j => a.terms(touched(j)) -> counts(touched(j)) }.toMap
    java.util.Arrays.fill(counts, 0)
    m
  }

  test("classic he/she/his/hers output chains: every suffix term fires at the right end") {
    // "ushers" without bounds contains she, he, hers — the canonical AC case
    val got = countAll("ushers", Seq("he", "she", "his", "hers"), wordBounds = false)
    assert(got == Map("she" -> 1, "he" -> 1, "hers" -> 1))
    // with word bounds none of them is a standalone word here
    assert(countAll("ushers", Seq("he", "she", "his", "hers")).isEmpty)
  }

  test("word boundaries: RE2 \\b semantics (digits and underscore are word chars)") {
    val terms = Seq("ass", "winner")
    assert(countAll("class assembly ass", terms) == Map("ass" -> 1))
    assert(countAll("winner-takes-all grandwinner winner2 _winner (winner)", terms) ==
      Map("winner" -> 2)) // the dash form and the parenthesized form only
  }

  test("ascii folding matches lower(): mixed-case text, lowercase terms; fold requires lowercase terms") {
    assert(countAll("CASINO Casino casino CaSiNo", Seq("casino")) == Map("casino" -> 4))
    intercept[IllegalArgumentException] { Lexicon.compile(Seq("Casino"), asciiFold = true) }
    // no fold: exact case only
    assert(countAll("CASINO casino", Seq("casino"), asciiFold = false) == Map("casino" -> 1))
  }

  test("all-occurrence semantics without bounds: overlapping matches of a bordered term each count") {
    assert(countAll("aaa", Seq("aa"), wordBounds = false) == Map("aa" -> 2))
  }

  test("phrase terms, duplicates deduped, empty term rejected") {
    assert(countAll("free money and free money", Seq("free money", "free money")) ==
      Map("free money" -> 2))
    intercept[IllegalArgumentException] { Lexicon.compile(Seq("")) }
    intercept[IllegalArgumentException] { Lexicon.compile(Nil) }
  }

  test("automaton parity with naive regex counting on pseudo-random small-alphabet text") {
    val terms = Seq("ab", "aba", "bab", "abab", "b")
    val a = Lexicon.compile(terms, asciiFold = false)
    val counts = new Array[Int](a.nTerms)
    val touched = new Array[Int](a.nTerms)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(30)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      val nt = a.countInto(s, wordBounds = false, asciiFold = false, counts, touched)
      val got = (0 until nt).map(j => a.terms(touched(j)) -> counts(touched(j))).toMap
      (0 until nt).foreach(j => counts(touched(j)) = 0)
      val want = terms.map { t =>
        // all occurrences incl. overlapping
        t -> s.indices.count(i => s.startsWith(t, i))
      }.filter(_._2 > 0).toMap
      assert(got == want, s"text=$s")
    }
  }

  test("automaton parity with naive counting under WORD BOUNDS on random mixed text") {
    val terms = Seq("ab", "ba", "a", "free money", "b_c")
    val a = Lexicon.compile(terms, asciiFold = false)
    val counts = new Array[Int](a.nTerms)
    val touched = new Array[Int](a.nTerms)
    def isWord(c: Char) = c.isLetterOrDigit && c < 128 || c == '_'
    val rnd = new scala.util.Random(99)
    val alphabet = "ab_ .-x"
    (1 to 300).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val nt = a.countInto(s, wordBounds = true, asciiFold = false, counts, touched)
      val got = (0 until nt).map(j => a.terms(touched(j)) -> counts(touched(j))).toMap
      (0 until nt).foreach(j => counts(touched(j)) = 0)
      val want = terms.map { t =>
        t -> s.indices.count { i =>
          s.startsWith(t, i) &&
            (i == 0 || !isWord(s.charAt(i - 1))) &&
            (i + t.length >= s.length || !isWord(s.charAt(i + t.length)))
        }
      }.filter(_._2 > 0).toMap
      assert(got == want, s"text='$s'")
    }
  }

  test("tagDocs + termStats end to end: sparse rows, zero-hit term kept, null text safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "free money for the winner"),
      (2L, "nothing to see"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val terms = Seq("free money", "winner", "forbidden")
    val tagged = Lexicon.tagDocs(docs, "doc_id", "text", terms)
    assert(tagged.count() == 3)
    val rows = tagged.select($"doc_id", $"n_hits").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
    val stats = Lexicon.termStats(tagged, terms)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(stats.toSeq == Seq(("forbidden", 0L, 0L), ("free money", 1L, 1L), ("winner", 1L, 1L)))
  }

  test("scratch reset discipline: repeated docs in one partition do not leak counts") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, "spam ham spam")).toDF("doc_id", "text").repartition(1)
    val tagged = Lexicon.tagDocs(docs, "doc_id", "text", Seq("spam", "ham"))
    val perDoc = tagged.select($"n_hits").as[Long].collect()
    assert(perDoc.forall(_ == 3L), "counts must reset between documents")
  }
}
