package graft

import graft.operators.ExtractKernel
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Parity against the reference's OWN committed artifacts — the strongest
  * "matches the reference" evidence available: `/root/reference/input_files/`
  * (16 files) → `/root/reference/output/` (the de-facto golden corpus the
  * reference's `compare_extraction.py:55-78` diffs against). The
  * OCR-dependent image outputs are out of scope per the north rule (OCR
  * replaced by deterministic kernels); everything text-layer-reachable is
  * asserted here, file by file:
  *
  *  - The 4 true `.txt` inputs: the reference's committed outputs are
  *    byte-identical pass-throughs of the inputs (verified by `cmp` at spec
  *    authoring time and re-verified live here) — our txt kernel must
  *    reproduce the committed output BYTE-IDENTICALLY.
  *  - `sample.pdf` and `Autonomous Vehicle Simulation project.docx` are
  *    NOT pdf/docx at all — both are plain-text payloads wearing the wrong
  *    extension. The reference's extension-routed extractor failed on both
  *    (its committed outputs are the 19-byte `[No text extracted]`
  *    placeholder); our CONTENT sniff (magic bytes first, the MIME-first
  *    analog of `combined_pipeline.py:178-206` done right) routes them to
  *    the txt kernel and extracts the full text. This is a documented,
  *    justified delta: the committed placeholder is the reference's own
  *    failure artifact, and the full text is strictly more faithful to the
  *    input. Asserted: our text == the input payload byte-identically, and
  *    our placeholder CONSTANT equals the reference's placeholder string.
  *  - The 2 real PDFs (Canva and Skia/Chrome generators: Type0/Identity-H
  *    CID fonts + ToUnicode CMaps, nested Form XObjects, flipped CTMs)
  *    extract through the real text-layer path. Asserted: the resume's
  *    extracted text is WORD-FOR-WORD identical to the reference's own
  *    committed output (token multiset equality, 360/360 — only line-wrap
  *    positions differ); the 27-page exam PDF reaches ≥ 98% of our tokens
  *    present in the reference output and ≥ 90% of the reference's tokens
  *    present in ours — the residual is the reference's OCR-derived text
  *    from embedded images, out of scope per north rule.
  *  - The 6 image inputs (png/jpg): OCR-only content, n/a per north rule;
  *    asserted: sniffed as binary payloads → status=unsupported with the
  *    placeholder, never misrouted to a text kernel.
  */
class ReferenceParitySpec extends AnyFunSuite {

  private val inDir = Paths.get("/root/reference/input_files")
  private val outDir = Paths.get("/root/reference/output")

  private def extractFile(name: String): Extracted = {
    val bytes = Files.readAllBytes(inDir.resolve(name))
    ExtractKernel.extractOneIn(
      PageIn(name, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), bytes, "en"))
  }

  private def refOutput(stem: String): String =
    new String(Files.readAllBytes(outDir.resolve(stem + ".txt")), "UTF-8")

  test("4 true txt inputs reproduce the reference's committed outputs byte-identically") {
    val txts = Seq("test.txt", "KMRL_demo_text.txt", "ocr_output.txt", "ocr_outut.txt")
    for (f <- txts) {
      val in = Files.readAllBytes(inDir.resolve(f))
      val refOut = Files.readAllBytes(outDir.resolve(f.stripSuffix(".txt") + ".txt"))
      // the reference's txt path is a pass-through: committed output ==
      // input (re-verify live so a changed reference tree fails loudly)
      assert(java.util.Arrays.equals(in, refOut), s"$f: reference output is no longer a pass-through")
      val e = extractFile(f)
      assert(e.format == "txt" && e.status == "ok", s"$f: $e")
      // one documented, deliberate delta: a UTF-8 BOM is charset SIGNALING,
      // not content — our cascade consumes it (reported as charset
      // 'utf-8-bom') where the reference's codec passes it through. Byte
      // identity therefore holds modulo a leading BOM (KMRL_demo_text.txt
      // is the only BOM-carrying input).
      val refBody =
        if (refOut.length >= 3 && (refOut(0) & 0xFF) == 0xEF && (refOut(1) & 0xFF) == 0xBB && (refOut(2) & 0xFF) == 0xBF)
          java.util.Arrays.copyOfRange(refOut, 3, refOut.length)
        else refOut
      assert(e.text.getBytes("UTF-8").sameElements(refBody),
        s"$f: extracted text is not byte-identical to the reference's committed output")
      if (refBody.length != refOut.length) assert(e.charset == "utf-8-bom", s"$f: $e")
    }
  }

  test("misnamed text payloads (sample.pdf, the fake .docx): content sniff wins where extension routing failed") {
    for (f <- Seq("sample.pdf", "Autonomous Vehicle Simulation project.docx")) {
      val in = Files.readAllBytes(inDir.resolve(f))
      val e = extractFile(f)
      // both payloads are plain text; the content sniff must route them to
      // the txt kernel regardless of extension
      assert(e.format == "txt" && e.status == "ok", s"$f: $e")
      assert(e.text.getBytes("UTF-8").sameElements(in),
        s"$f: extracted text is not byte-identical to the input payload")
      // the reference's committed output for BOTH is its failure
      // placeholder — and our placeholder constant is the same string, so
      // the delta is exactly {full text} vs {placeholder}, nothing else
      val stem = f.substring(0, f.lastIndexOf('.'))
      assert(refOutput(stem) == graft.functions.TextAssembly.NoText,
        s"$f: reference committed output changed; parity story needs re-checking")
    }
  }

  private def tokenCounts(s: String): Map[String, Int] =
    s.split("\\s+").filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size).toMap

  /** (fraction of `a` tokens present in `b`, fraction of `b` in `a`) by
    * multiset intersection — whitespace-insensitive text parity.
    */
  private def tokenOverlap(a: String, b: String): (Double, Double) = {
    val am = tokenCounts(a); val bm = tokenCounts(b)
    val inter = am.map { case (k, c) => math.min(c, bm.getOrElse(k, 0)) }.sum.toDouble
    (inter / math.max(1, am.values.sum), inter / math.max(1, bm.values.sum))
  }

  test("real-world PDF text layers match the reference's committed outputs (token-level)") {
    // Canva resume: WORD-FOR-WORD identical to the reference's own output —
    // every token ours has is in the reference's and vice versa (the only
    // difference is where lines wrap)
    val resume = extractFile("ABINAYA_Resume.pdf")
    assert(resume.format == "pdf" && resume.status == "ok", s"resume: $resume")
    val (rOurs, rRef) = tokenOverlap(resume.text, refOutput("ABINAYA_Resume"))
    assert(rOurs == 1.0 && rRef == 1.0,
      f"resume token overlap ours=$rOurs%.3f ref=$rRef%.3f (expected exact multiset identity)")

    // Skia/Chrome 27-page exam: everything in our text-layer output is in
    // the reference's (>= 98%); the reference additionally carries
    // OCR-derived text from 6 embedded images (out of scope per north
    // rule), so its side recalls >= 90%
    val exam = extractFile(
      "22ai501_22am501 Artificial Intelligence 24-25 PT1 - 22AI501_22AM501 ARTIFICIAL INTELLIGENCE 24-25 .pdf")
    assert(exam.format == "pdf" && exam.status == "ok", s"exam: $exam")
    val (eOurs, eRef) = tokenOverlap(exam.text,
      refOutput("22ai501_22am501 Artificial Intelligence 24-25 PT1 - 22AI501_22AM501 ARTIFICIAL INTELLIGENCE 24-25 "))
    assert(eOurs >= 0.98, f"exam: ours-in-ref $eOurs%.3f < 0.98")
    assert(eRef >= 0.90, f"exam: ref-in-ours $eRef%.3f < 0.90")
  }

  test("image inputs are binary/unsupported (OCR content is n/a per north rule), never misrouted") {
    val images = Seq(
      "13640_2015_102_Fig4_HTML.png", "7376232IT102.png", "beach.png",
      "Screenshot 2024-04-29 202707.png",
      "WhatsApp Image 2025-11-20 at 16.30.14_d79072ad.jpg",
      "applsci-13-09712-g004-550.jpg", "text2.jpg", "text_image.jpg")
    for (f <- images) {
      val e = extractFile(f)
      assert(e.format == "unsupported" && e.status == "unsupported",
        s"$f: image routed somewhere unexpected: $e")
      assert(e.text == graft.functions.TextAssembly.NoText)
    }
  }
}
