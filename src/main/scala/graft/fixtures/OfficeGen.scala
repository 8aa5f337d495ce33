package graft.fixtures

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Synthetic office/CSV/RTF documents + goldens-by-construction
  * (SURVEY.md §2.7 F5-F10). ZIP entries carry a FIXED timestamp so the
  * produced bytes are bit-deterministic across runs/JVMs.
  */
object OfficeGen {

  final case class GenDoc(bytes: Array[Byte], golden: String)

  private val FixedTime = 1735689600000L // 2025-01-01T00:00:00Z

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4096)
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      z.putNextEntry(e)
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def xmlEsc(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ---- DOCX ---------------------------------------------------------------

  /** Paragraphs joined "\n" (simple_extract.py:142-151 contract). Some
    * paragraphs split across two runs (python-docx concatenates runs).
    */
  def docx(r: Rng): GenDoc = {
    val paras = (0 until r.range(3, 10)).map(_ => Words.paragraph(r, 0))
    val body = paras.map { p =>
      if (r.chance(30) && p.length > 10) {
        val cut = p.length / 2
        s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEsc(p.substring(0, cut))}</w:t></w:r>" +
          s"<w:r><w:t xml:space=\"preserve\">${xmlEsc(p.substring(cut))}</w:t></w:r></w:p>"
      } else s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEsc(p)}</w:t></w:r></w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>$body</w:body></w:document>""".stripMargin
    val ct =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""".stripMargin
    GenDoc(zip(Seq("[Content_Types].xml" -> ct, "word/document.xml" -> doc)), paras.mkString("\n"))
  }

  // ---- XLSX ---------------------------------------------------------------

  /** "Sheet: name" + \t rows, sheets joined "\n\n"
    * (simple_extract.py:217-237 contract).
    */
  def xlsx(r: Rng): GenDoc = {
    val nSheets = r.range(1, 3)
    val sheetNames = (1 to nSheets).map(i => s"Data$i")
    val sharedPool = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = sharedPool.getOrElseUpdate(s, sharedPool.size)

    val sheets = (1 to nSheets).map { si =>
      val nRows = r.range(2, 6)
      val nCols = r.range(2, 5)
      val rows = (0 until nRows).map { _ =>
        (0 until nCols).map { _ =>
          if (r.chance(30)) r.nextInt(100000).toString // numeric cell
          else r.pick(Words.core) + " " + r.pick(Words.core)
        }
      }
      (si, rows)
    }
    val sheetXml = sheets.map { case (si, rows) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellsXml = cells.zipWithIndex.map { case (v, ci) =>
          if (v.forall(_.isDigit)) s"""<c r="${colRef(ci, ri)}"><v>$v</v></c>"""
          else s"""<c r="${colRef(ci, ri)}" t="s"><v>${sharedIdx(v)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cellsXml</row>"""
      }.mkString
      s"xl/worksheets/sheet$si.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
    }
    val ssXml = "xl/sharedStrings.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${sharedPool.keys.map(s => s"<si><t xml:space=\"preserve\">${xmlEsc(s)}</t></si>").mkString}</sst>""".stripMargin
    val wbXml = "xl/workbook.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets>${sheetNames.zipWithIndex.map { case (n, i) => s"""<sheet name="$n" sheetId="${i + 1}"/>""" }.mkString}</sheets></workbook>""".stripMargin

    val golden = sheets.map { case (si, rows) =>
      (s"Sheet: ${sheetNames(si - 1)}" +: rows.map(_.mkString("\t")).filter(_.trim.nonEmpty)).mkString("\n")
    }.mkString("\n\n")
    GenDoc(zip(Seq(wbXml, ssXml) ++ sheetXml), golden)
  }

  private def colRef(ci: Int, ri: Int): String = ('A' + ci).toChar.toString + (ri + 1)

  // ---- PPTX ---------------------------------------------------------------

  /** "Slide N:" + shape texts, slides joined "\n\n"
    * (simple_extract.py:197-215 contract).
    */
  def pptx(r: Rng): GenDoc = {
    val nSlides = r.range(1, 4)
    val slides = (1 to nSlides).map { si =>
      val shapes = (0 until r.range(1, 3)).map { _ =>
        (0 until r.range(1, 3)).map(_ => Words.sentence(r, r.range(3, 9), 0))
      }
      (si, shapes)
    }
    val entries = slides.map { case (si, shapes) =>
      val shapesXml = shapes.map { paras =>
        val parasXml = paras.map(p => s"""<a:p><a:r><a:t>${xmlEsc(p)}</a:t></a:r></a:p>""").mkString
        s"""<p:sp><p:txBody>$parasXml</p:txBody></p:sp>"""
      }.mkString
      s"ppt/slides/slide$si.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>$shapesXml</p:spTree></p:cSld></p:sld>""".stripMargin
    }
    val pres = "ppt/presentation.xml" ->
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""".stripMargin
    val golden = slides.map { case (si, shapes) =>
      s"Slide $si:\n" + shapes.map(_.mkString("\n")).mkString("\n")
    }.mkString("\n\n")
    GenDoc(zip(pres +: entries), golden)
  }

  // ---- ODT ----------------------------------------------------------------

  /** Every text node on its own line (enhanced_extract.py:516-537 contract). */
  def odt(r: Rng): GenDoc = {
    val paras = (0 until r.range(3, 10)).map(_ => Words.paragraph(r, 0))
    val content = "content.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:text>${paras
          .map(p => s"<text:p>${xmlEsc(p)}</text:p>")
          .mkString}</office:text></office:body></office:document-content>""".stripMargin
    GenDoc(zip(Seq("mimetype" -> "application/vnd.oasis.opendocument.text", content)), paras.mkString("\n"))
  }

  // ---- CSV ----------------------------------------------------------------

  /** \t-joined cells, \n-joined rows (enhanced_extract.py:434-443 contract).
    * Includes quoted cells with embedded commas/quotes.
    */
  def csv(r: Rng): GenDoc = {
    val nCols = r.range(2, 6)
    val nRows = r.range(3, 10)
    val rows = (0 until nRows).map { _ =>
      (0 until nCols).map { _ =>
        if (r.chance(10)) s"${r.pick(Words.core)}, ${r.pick(Words.core)}" // comma inside
        else if (r.chance(5)) s"say \"${r.pick(Words.core)}\"" // quote inside
        else if (r.chance(20)) r.nextInt(100000).toString
        else r.pick(Words.core)
      }
    }
    def cell(v: String): String =
      if (v.contains(",") || v.contains("\"") || v.contains("\n"))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    val text = rows.map(_.map(cell).mkString(",")).mkString("\n")
    GenDoc(text.getBytes(StandardCharsets.UTF_8), rows.map(_.mkString("\t")).mkString("\n"))
  }

  // ---- RTF ----------------------------------------------------------------

  /** Reference fallback contract (enhanced_extract.py:473-481): control
    * words + one trailing whitespace stripped, braces stripped, lines
    * cleaned. The writer emits "\par \n" so the newline survives the
    * control-word regex.
    */
  def rtf(r: Rng): GenDoc = {
    val lines = (0 until r.range(3, 10)).map(_ => Words.sentence(r, r.range(4, 12), 0))
    val sb = new StringBuilder("{\\rtf1\\ansi\\deff0 \n")
    lines.foreach(l => sb.append(l).append("\\par \n"))
    sb.append("}")
    GenDoc(sb.toString.getBytes(StandardCharsets.UTF_8), lines.mkString("\n"))
  }
}
