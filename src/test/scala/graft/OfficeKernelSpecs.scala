package graft

import graft.fixtures.{OfficeGen, Rng}
import graft.functions.{CsvKernel, FormatSniff, RtfKernel}
import graft.functions.office.{DocxKernel, OdtKernel, PptxKernel, XlsxKernel}
import org.scalatest.funsuite.AnyFunSuite

/** Per-kernel roundtrips for the office/CSV/RTF formats (SURVEY §2.7
  * F5-F10): writer → sniffer → kernel → golden, over many seeds.
  */
class OfficeKernelSpecs extends AnyFunSuite {

  test("csv: quoting, embedded commas/quotes, sniffer") {
    (0 until 100).foreach { i =>
      val d = OfficeGen.csv(new Rng(500L + i))
      assert(FormatSniff.sniff(d.bytes) == "csv", s"seed $i sniff")
      val (text, _) = CsvKernel.extract(new String(d.bytes, "UTF-8"))
      assert(text == d.golden, s"seed $i")
    }
    // hand-rolled edge cases
    assert(CsvKernel.extract("a,\"b,c\",d\n\"x\"\"y\",z,")._1 == "a\tb,c\td\nx\"y\tz\t")
    assert(CsvKernel.extract("a,b\n\n\nc,d")._1 == "a\tb\nc\td") // empty rows skipped
  }

  test("rtf: control words + braces stripped, line cleanup, sniffer") {
    (0 until 100).foreach { i =>
      val d = OfficeGen.rtf(new Rng(600L + i))
      assert(FormatSniff.sniff(d.bytes) == "rtf", s"seed $i sniff")
      val (text, _) = RtfKernel.extract(new String(d.bytes, "UTF-8"))
      assert(text == d.golden, s"seed $i")
    }
  }

  test("docx: paragraphs across runs, sniffer") {
    (0 until 60).foreach { i =>
      val d = OfficeGen.docx(new Rng(700L + i))
      assert(FormatSniff.sniff(d.bytes) == "docx", s"seed $i sniff")
      assert(DocxKernel.extract(d.bytes)._1 == d.golden, s"seed $i")
    }
  }

  test("xlsx: shared strings + numeric cells + sheet names, sniffer") {
    (0 until 60).foreach { i =>
      val d = OfficeGen.xlsx(new Rng(800L + i))
      assert(FormatSniff.sniff(d.bytes) == "xlsx", s"seed $i sniff")
      assert(XlsxKernel.extract(d.bytes)._1 == d.golden, s"seed $i")
    }
  }

  test("pptx: slide order, shapes, paragraph joins, sniffer") {
    (0 until 60).foreach { i =>
      val d = OfficeGen.pptx(new Rng(900L + i))
      assert(FormatSniff.sniff(d.bytes) == "pptx", s"seed $i sniff")
      assert(PptxKernel.extract(d.bytes)._1 == d.golden, s"seed $i")
    }
  }

  test("odt: text nodes per line, sniffer") {
    (0 until 60).foreach { i =>
      val d = OfficeGen.odt(new Rng(1000L + i))
      assert(FormatSniff.sniff(d.bytes) == "odt", s"seed $i sniff")
      assert(OdtKernel.extract(d.bytes)._1 == d.golden, s"seed $i")
    }
  }

  test("corrupted containers fail cleanly (status, not exception)") {
    val d = OfficeGen.docx(new Rng(1L))
    val cut = java.util.Arrays.copyOf(d.bytes, d.bytes.length / 2)
    // truncated zip: either sniffed as binary or kernel fails with status
    val p = Page("u", new java.sql.Timestamp(0), cut, "", "en")
    val out = graft.operators.ExtractKernel.extractOne(p)
    assert(out.status == "failed" || out.status == "unsupported")
    assert(out.text == graft.functions.TextAssembly.NoText)
  }
}
