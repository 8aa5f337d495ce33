package graft

import graft.fixtures.CorpusGen
import graft.operators.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** The north-rule invariant at kernel level: for every synthetic page,
  * extracted text == golden `text`, byte-for-byte (UTF-8 string equality —
  * Scala Strings compare by UTF-16 code units, which is equivalent for
  * well-formed text). Runs over 2,000 generated ids so every family/variant
  * combination is hit many times. Pure (no SparkSession) → fast feedback.
  */
class KernelGoldenSpec extends AnyFunSuite {

  private def diffMsg(id: Long, p: Page, got: Extracted): String = {
    val g = p.text
    val e = got.text
    val firstDiff = g.zip(e).indexWhere { case (a, b) => a != b } match {
      case -1 => math.min(g.length, e.length)
      case i  => i
    }
    val ctx = 60
    val lo = math.max(0, firstDiff - ctx)
    s"""id=$id url=${p.url} fmt=${got.format} status=${got.status} err=${got.error}
       |golden len=${g.length} got len=${e.length} first diff @ $firstDiff
       |golden: ...${g.slice(lo, firstDiff + ctx).replace("\n", "\\n")}...
       |got   : ...${e.slice(lo, firstDiff + ctx).replace("\n", "\\n")}...""".stripMargin
  }

  test("byte-identical extraction for 2000 generated pages (all families)") {
    var failures = 0
    var firstFailure: Option[String] = None
    val byFormat = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (0L until 2000L).foreach { id =>
      val p = CorpusGen.page(id)
      val got = ExtractKernel.extractOne(p)
      byFormat(got.format) += 1
      if (got.text != p.text) {
        failures += 1
        if (firstFailure.isEmpty) firstFailure = Some(diffMsg(id, p, got))
      }
    }
    // every format family must actually be exercised
    assert(byFormat("html") > 500, s"html coverage: $byFormat")
    assert(byFormat("pdf") > 300, s"pdf coverage: $byFormat")
    assert(byFormat("txt") > 200, s"txt coverage: $byFormat")
    Seq("csv", "rtf", "docx", "xlsx", "pptx", "odt").foreach { f =>
      assert(byFormat(f) >= 40, s"$f coverage: $byFormat")
    }
    assert(byFormat("unsupported") > 10, s"degenerate coverage: $byFormat")
    assert(failures == 0, s"$failures/2000 mismatched. First:\n${firstFailure.getOrElse("")}")
  }

  test("extraction is deterministic (same id → same bytes → same text)") {
    (0L until 50L).foreach { id =>
      val a = ExtractKernel.extractOne(CorpusGen.page(id))
      val b = ExtractKernel.extractOne(CorpusGen.page(id))
      assert(a == b, s"id=$id not deterministic")
    }
  }
}
