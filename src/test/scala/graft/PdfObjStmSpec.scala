package graft

import graft.functions.pdf.PdfExtractor
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** PDF 1.5+ object-stream profile: the modern generator default (pdflatex,
  * word-to-pdf, most post-2010 producers) stores non-stream objects
  * compressed inside /ObjStm containers indexed by an XRef STREAM — there
  * is no classic xref table and the catalog/page dicts exist only inside
  * the object streams. The extractor's byte scan finds the containers and
  * pass 3 surfaces their members, so this profile parses without ever
  * touching an xref.
  */
class PdfObjStmSpec extends AnyFunSuite {

  /** Hand-assembled 1.5-profile file: objects 1-3 (catalog/pages/page)
    * live ONLY inside the ObjStm (object 4); the content stream is object
    * 5; object 6 is an XRef-stream-shaped dict carrying /Root.
    */
  private def buildObjStmPdf(flate: Boolean): Array[Byte] = {
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources << /Font << >> >> >>"
    val bodies = Seq(1 -> o1, 2 -> o2, 3 -> o3)
    val offsets = bodies.scanLeft(0) { case (acc, (_, b)) => acc + b.length + 1 }
    val header = bodies.zip(offsets).map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = (header + bodies.map(_._2).mkString("\n") + "\n").getBytes(StandardCharsets.ISO_8859_1)
    val first = header.length
    val stmData = if (flate) {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    } else payload

    val content = "BT /F1 12 Tf 1 0 0 1 72 720 Tm (hello from an object stream) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)

    val out = new ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    val filt = if (flate) " /Filter /FlateDecode" else ""
    w(s"4 0 obj\n<< /Type /ObjStm /N 3 /First $first /Length ${stmData.length}$filt >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    // XRef-stream-shaped trailer dict: carries /Root (no classic trailer)
    w("6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [1 2 1] /Length 4 >>\nstream\n")
    out.write(Array[Byte](0, 0, 0, 0))
    w("\nendstream\nendobj\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  test("catalog/pages/page inside a raw ObjStm parse and extract") {
    val r = PdfExtractor.extract(buildObjStmPdf(flate = false))
    assert(r.isRight, r)
    assert(r.toOption.get.text.contains("hello from an object stream"))
  }

  test("FlateDecode ObjStm parses identically") {
    val r = PdfExtractor.extract(buildObjStmPdf(flate = true))
    assert(r.isRight, r)
    assert(r.toOption.get.text.contains("hello from an object stream"))
  }

  test("a top-level object shadows an ObjStm member of the same number") {
    // append a top-level replacement for object 3 pointing at different
    // content — incremental-update semantics: top level wins
    val base = buildObjStmPdf(flate = false)
    val extraContent = "BT /F1 12 Tf (updated page) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream()
    out.write(base, 0, base.length - "%%EOF\n".length)
    def w(str: String): Unit = out.write(str.getBytes(StandardCharsets.ISO_8859_1))
    w(s"7 0 obj\n<< /Length ${extraContent.length} >>\nstream\n")
    out.write(extraContent)
    w("\nendstream\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>\nendobj\n%%EOF\n")
    val r = PdfExtractor.extract(out.toByteArray)
    assert(r.isRight, r)
    assert(r.toOption.get.text.contains("updated page"))
    assert(!r.toOption.get.text.contains("hello from"))
  }

  private def simpleFontPdf(encodingEntry: String, textBytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 4 0 R >> >> >>\nendobj\n")
    w(s"4 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont /Arial $encodingEntry >>\nendobj\n")
    val content = new ByteArrayOutputStream()
    content.write("BT /F1 12 Tf 1 0 0 1 72 720 Tm (".getBytes(StandardCharsets.ISO_8859_1))
    content.write(textBytes)
    content.write(") Tj ET".getBytes(StandardCharsets.ISO_8859_1))
    val cs = content.toByteArray
    w(s"5 0 obj\n<< /Length ${cs.length} >>\nstream\n")
    out.write(cs)
    w("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("WinAnsiEncoding maps the 0x80-0x9F band (curly quotes, dashes) correctly") {
    // bytes: 0x93 Hi 0x94 0x96 there -> “Hi”–there under Windows-1252
    val text = Array[Byte](0x93.toByte, 'H', 'i', 0x94.toByte, 0x96.toByte)
    val r = PdfExtractor.extract(simpleFontPdf("/Encoding /WinAnsiEncoding", text))
    assert(r.isRight, r)
    assert(r.toOption.get.text.contains("“Hi”–"), r.toOption.get.text)
  }

  test("/Differences name remaps apply, and ToUnicode entries would win over them") {
    // map code 65 ('A') -> bullet, 66 stays 'B' structurally
    val enc = "/Encoding << /Type /Encoding /Differences [65 /bullet /b] >>"
    val r = PdfExtractor.extract(simpleFontPdf(enc, "AB hello".getBytes(StandardCharsets.ISO_8859_1)))
    assert(r.isRight, r)
    val t = r.toOption.get.text
    assert(t.contains("•b hello"), t) // 65 -> bullet, 66 -> /b (differences run on)
  }

  test("corrupt ObjStm headers degrade to missing objects, never a crash") {
    val base = new String(buildObjStmPdf(flate = false), StandardCharsets.ISO_8859_1)
    val bad = base.replace("/First", "/Firsst") // header unparseable
    val r = PdfExtractor.extract(bad.getBytes(StandardCharsets.ISO_8859_1))
    assert(r.isLeft) // catalog never surfaces -> loud Left, no exception
  }

}
