package graft.fixtures

import graft.Page
import graft.functions.TextAssembly
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).
  * Everything derives from (GlobalSeed, id) — generation is a pure function
  * of the row id, so it parallelizes across Spark tasks with no coordination
  * and is reproducible across runs/JVMs (no wall clock, no shared RNG).
  *
  * Format mix per id%40: 16×HTML-clean, 4×HTML-adversarial, 7×PDF, 6×TXT,
  * 1 each of CSV/RTF/DOCX/XLSX/PPTX/ODT, 1×degenerate slot (empty / binary
  * garbage / truncated PDF / giant HTML page). ~20% of rows land on one hot
  * host to exercise skew handling; giant pages land on the hot host
  * (FIXTURES.md §2).
  */
object CorpusGen {

  private val EpochMs = 1735689600000L // 2025-01-01T00:00:00Z
  private val SpreadMs = 14L * 24 * 3600 * 1000 // 14 days of warc_ts

  final val HotHost = "hot.example.com"

  def hostFor(r: Rng): String =
    if (r.chance(20)) HotHost else s"site-${r.nextInt(40)}.example.org"

  /** Build one page row. Pure function of id. */
  def page(id: Long): Page = {
    val r = Rng.forDoc(id)
    val family = (id % 40).toInt
    val host = hostFor(r)
    val ts = new Timestamp(EpochMs + java.lang.Math.floorMod(id * 7919L * 1000L, SpreadMs))
    val tier = if (r.chance(5)) 2 else if (r.chance(20)) 1 else 0
    val lang = if (tier == 2) "ml" else "en"

    def url(kind: String) = s"https://$host/$kind/$id"

    family match {
      case f if f < 16 => // HTML clean (40%)
        val gp = HtmlGen.clean(r, tier)
        val enc = encodeHtml(gp.html, r, tier)
        // ~15% arrive gzip-wrapped (Content-Encoding / per-record WARC
        // gzip); golden unchanged — the kernel sees through the envelope
        val bytes = if (r.chance(15)) graft.functions.Codecs.gzip(enc) else enc
        Page(url("page"), ts, bytes, gp.golden, lang)
      case f if f < 20 => // HTML adversarial (10%)
        val gp = HtmlGen.adversarial(r, tier)
        Page(url("adv"), ts, gp.html.getBytes(StandardCharsets.UTF_8), gp.golden, lang)
      case f if f < 27 => // PDF (17.5%)
        val gp = PdfGen.gen(r)
        Page(url("doc"), ts, gp.bytes, gp.golden, "en")
      case f if f < 33 => // plain text (15%)
        val (bytes, golden) = genTxt(r, tier)
        Page(url("txt"), ts, bytes, golden, lang)
      case 33 => val d = OfficeGen.csv(r); Page(url("csv"), ts, d.bytes, d.golden, "en")
      case 34 => val d = OfficeGen.rtf(r); Page(url("rtf"), ts, d.bytes, d.golden, "en")
      case 35 => val d = OfficeGen.docx(r); Page(url("docx"), ts, d.bytes, d.golden, "en")
      case 36 => val d = OfficeGen.xlsx(r); Page(url("xlsx"), ts, d.bytes, d.golden, "en")
      case 37 => val d = OfficeGen.pptx(r); Page(url("pptx"), ts, d.bytes, d.golden, "en")
      case 38 => val d = OfficeGen.odt(r); Page(url("odt"), ts, d.bytes, d.golden, "en")
      case _ => // degenerate / giant (2.5%)
        r.nextInt(4) match {
          case 0 => Page(url("empty"), ts, Array.emptyByteArray, TextAssembly.NoText, "en")
          case 1 if r.chance(50) =>
            // corrupt gzip: valid magic, truncated stream — must land as
            // an unsupported page, never a thrown task
            val whole = graft.functions.Codecs.gzip(
              Words.paragraph(r, 0).getBytes(StandardCharsets.UTF_8))
            val cut = java.util.Arrays.copyOf(whole, math.max(4, whole.length / 2))
            Page(url("badgz"), ts, cut, TextAssembly.NoText, "en")
          case 1 =>
            val garbage = Array.tabulate[Byte](r.range(64, 512))(_ => (r.nextInt(256) - 128).toByte)
            garbage(0) = 0 // guarantee the binary sniff (NUL byte)
            Page(url("bin"), ts, garbage, TextAssembly.NoText, "en")
          case 2 =>
            val full = PdfGen.gen(r).bytes
            val cut = java.util.Arrays.copyOf(full, (full.length * 6) / 10)
            Page(url("truncpdf"), ts, cut, TextAssembly.NoText, "en")
          case _ => // giant valid HTML on the hot host (skew driver)
            val gp = HtmlGen.clean(r, 0, giant = true)
            Page(s"https://$HotHost/giant/$id", ts, gp.html.getBytes(StandardCharsets.UTF_8), gp.golden, "en")
        }
    }
  }

  /** HTML bytes: mostly UTF-8; ~15% latin-1 with a meta charset tag (only
    * when content is latin-1-encodable, i.e. not the Malayalam tier).
    */
  private def encodeHtml(html: String, r: Rng, tier: Int): Array[Byte] =
    if (tier != 2 && r.chance(15)) {
      val tagged = html.replace(
        "<head>",
        "<head>\n<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">"
      )
      tagged.getBytes(StandardCharsets.ISO_8859_1)
    } else html.getBytes(StandardCharsets.UTF_8)

  /** Plain-text payload in one of the charset variants; golden = decoded
    * verbatim (simple_extract.py:239-250 contract).
    */
  private def genTxt(r: Rng, tier: Int): (Array[Byte], String) = {
    val nPara = r.range(6, 24)
    val text = (0 until nPara).map(_ => Words.paragraph(r, tier)).mkString("\n\n")
    val raw = r.nextInt(5)
    // latin-1 variant only when the text is latin-1-encodable
    val variant = if (raw == 1 && !(tier != 2 && text.forall(_ <= 'ÿ'))) 0 else raw
    variant match {
      case 0 => (text.getBytes(StandardCharsets.UTF_8), text)
      case 1 => (text.getBytes(StandardCharsets.ISO_8859_1), text)
      case 2 =>
        val utf8 = text.getBytes(StandardCharsets.UTF_8)
        val out = new Array[Byte](utf8.length + 3)
        out(0) = 0xEF.toByte; out(1) = 0xBB.toByte; out(2) = 0xBF.toByte
        System.arraycopy(utf8, 0, out, 3, utf8.length)
        (out, text)
      case 3 =>
        val le = text.getBytes(StandardCharsets.UTF_16LE)
        val out = new Array[Byte](le.length + 2)
        out(0) = 0xFF.toByte; out(1) = 0xFE.toByte
        System.arraycopy(le, 0, out, 2, le.length)
        (out, text)
      case _ =>
        val be = text.getBytes(StandardCharsets.UTF_16BE)
        val out = new Array[Byte](be.length + 2)
        out(0) = 0xFE.toByte; out(1) = 0xFF.toByte
        System.arraycopy(be, 0, out, 2, be.length)
        (out, text)
    }
  }
}
