package graft.functions.pdf

import graft.functions.TextAssembly
import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** From-scratch PDF text extraction for the constrained subset our corpus
  * generator emits (SURVEY.md §2.7 F3, §7.3): xref + direct-/Length dicts,
  * raw or /FlateDecode content streams, text ops BT ET Tf Td TD Tm TL T-star
  * Tj TJ quote, ASCII text in literal strings. Reading order is reconstructed by
  * a recursive x-y cut over positioned glyph runs (column split on x-start
  * gaps ≥ 100 units, lines clustered on |Δy| ≤ 2, top-to-bottom, left column
  * first), the deterministic analog of the reference's per-page
  * page.get_text() + "[Page N]" assembly (enhanced_extract.py:275-313).
  * Anything outside the subset → Left(reason) → status='failed', text
  * placeholder, mirroring the reference's error rows
  * (enhanced_extract.py:617).
  */
object PdfExtractor {

  final case class Run(x: Double, y: Double, text: String)

  /** F4 per-page content analysis (combined_pipeline.py:271-291): has_text,
    * has_images (the page's /XObject resources reference an object whose
    * dict is /Subtype /Image), line count, and the reference's verbatim
    * table heuristic — page text containing a TAB or more than five '|'
    * characters.
    */
  final case class PageFeature(
      page: Int,
      has_text: Boolean,
      has_images: Boolean,
      n_lines: Int,
      has_tables: Boolean
  )

  final case class Result(text: String, nLines: Int, pages: Seq[PageFeature])

  private val objRe: Regex = """(\d+)\s+0\s+obj""".r
  private val rootRe: Regex = """/Root\s+(\d+)\s+0\s+R""".r
  private val pagesRe: Regex = """/Pages\s+(\d+)\s+0\s+R""".r
  private val kidsRe: Regex = """/Kids\s*\[([^\]]*)\]""".r
  private val refRe: Regex = """(\d+)\s+0\s+R""".r
  private val contentsRe: Regex = """/Contents\s+(\d+)\s+0\s+R""".r
  private val lengthRe: Regex = """/Length\s+(\d+)""".r
  private val xobjRe: Regex = """/XObject\s*<<([^>]*)>>""".r
  private val imageSubtypeRe: Regex = """/Subtype\s*/Image""".r

  def extract(bytes: Array[Byte]): Either[String, Result] =
    try extractUnsafe(bytes)
    catch { case e: Exception => Left(s"pdf parse error: ${e.getClass.getSimpleName}") }

  private def extractUnsafe(bytes: Array[Byte]): Either[String, Result] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return Left("missing %PDF header")
    if (!s.contains("%%EOF")) return Left("truncated pdf (no %%EOF)")

    // object table: objNum -> (dictText, streamBytesOpt)
    val objs = scala.collection.mutable.HashMap.empty[Int, (String, Option[Array[Byte]])]
    for (m <- objRe.findAllMatchIn(s)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val endObj = s.indexOf("endobj", bodyStart)
      if (endObj > 0) {
        val streamKw = s.indexOf("stream", bodyStart)
        if (streamKw >= 0 && streamKw < endObj) {
          val dict = s.substring(bodyStart, streamKw)
          var dataStart = streamKw + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val len = lengthRe.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse {
            return Left(s"object $num: no direct /Length")
          }
          if (dataStart + len > bytes.length) return Left(s"object $num: stream overruns file")
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)
          val data = if (dict.contains("/FlateDecode")) inflate(raw) else raw
          objs(num) = (dict, Some(data))
        } else {
          objs(num) = (s.substring(bodyStart, endObj), None)
        }
      }
    }
    if (objs.isEmpty) return Left("no objects")

    val rootNum = rootRe.findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(return Left("no /Root"))
    val catalog = objs.get(rootNum).map(_._1).getOrElse(return Left("missing catalog object"))
    val pagesNum = pagesRe.findFirstMatchIn(catalog).map(_.group(1).toInt).getOrElse(return Left("no /Pages"))
    val pagesDict = objs.get(pagesNum).map(_._1).getOrElse(return Left("missing pages object"))
    val kids = kidsRe.findFirstMatchIn(pagesDict).map(_.group(1)).getOrElse(return Left("no /Kids"))
    val pageNums = refRe.findAllMatchIn(kids).map(_.group(1).toInt).toList
    if (pageNums.isEmpty) return Left("empty /Kids")

    val pageResults = pageNums.map { pn =>
      val pageDict = objs.get(pn).map(_._1).getOrElse(return Left(s"missing page object $pn"))
      val cn = contentsRe.findFirstMatchIn(pageDict).map(_.group(1).toInt).getOrElse(return Left(s"page $pn: no /Contents"))
      val content = objs.get(cn).flatMap(_._2).getOrElse(return Left(s"page $pn: missing content stream"))
      val runs = parseContent(new String(content, StandardCharsets.ISO_8859_1))
      val hasImages = xobjRe.findFirstMatchIn(pageDict).exists { m =>
        refRe.findAllMatchIn(m.group(1)).exists { rm =>
          objs.get(rm.group(1).toInt).exists(o => imageSubtypeRe.findFirstIn(o._1).isDefined)
        }
      }
      (assemblePage(runs), hasImages)
    }
    val pageTexts = pageResults.map(_._1)
    val features = pageResults.zipWithIndex.map { case (((text, nLines), hasImages), i) =>
      PageFeature(i + 1, text.nonEmpty, hasImages, nLines, hasTables(text))
    }
    Right(Result(TextAssembly.assemblePages(pageTexts.map(_._1)), pageTexts.map(_._2).sum, features))
  }

  /** The reference's table heuristic, verbatim: '\t' present or > 5 pipes
    * (combined_pipeline.py:283-285).
    */
  private def hasTables(pageText: String): Boolean = {
    if (pageText.indexOf('\t') >= 0) return true
    var pipes = 0
    var i = 0
    while (i < pageText.length) { if (pageText.charAt(i) == '|') pipes += 1; i += 1 }
    pipes > 5
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary()) throw new IllegalStateException("flate dictionary")
    }
    inf.end()
    out.toByteArray
  }

  // ---- content stream interpreter --------------------------------------

  private sealed trait Operand
  private final case class Num(v: Double) extends Operand
  private final case class Str(v: String) extends Operand
  private final case class Arr(items: List[Operand]) extends Operand
  private final case class Name(v: String) extends Operand

  private[pdf] def parseContent(cs: String): ArrayBuffer[Run] = {
    val runs = new ArrayBuffer[Run](32)
    val stack = new ArrayBuffer[Operand](8)
    var tx, ty = 0.0 // current text position
    var lx, ly = 0.0 // line start
    var leading = 0.0
    var fontSize = 12.0
    var i = 0
    val n = cs.length

    def num(k: Int): Double = stack.lift(stack.length - k).collect { case Num(v) => v }.getOrElse(0.0)

    def emit(text: String): Unit = {
      if (text.nonEmpty) runs += Run(tx, ty, text)
      tx += text.length * fontSize * 0.5 // approximate advance (ordering only)
    }

    def op(name: String): Unit = {
      name match {
        case "BT" => tx = 0; ty = 0; lx = 0; ly = 0
        case "ET" => ()
        case "Tf" => fontSize = num(1)
        case "TL" => leading = num(1)
        case "Td" => lx += num(2); ly += num(1); tx = lx; ty = ly
        case "TD" => leading = -num(1); lx += num(2); ly += num(1); tx = lx; ty = ly
        case "Tm" => lx = num(2); ly = num(1); tx = lx; ty = ly
        case "T*" => ly -= leading; lx = lx; tx = lx; ty = ly
        case "Tj" =>
          stack.lastOption.collect { case Str(v) => v }.foreach(emit)
        case "'" =>
          ly -= leading; tx = lx; ty = ly
          stack.lastOption.collect { case Str(v) => v }.foreach(emit)
        case "TJ" =>
          stack.lastOption.collect { case Arr(items) =>
            val sb = new StringBuilder
            items.foreach {
              case Str(v)              => sb.append(v)
              case Num(adj) if adj <= -180 => sb.append(' ') // large negative kern = word gap
              case _                   => ()
            }
            emit(sb.toString)
          }
        case _ => () // graphics ops ignored
      }
      stack.clear()
    }

    while (i < n) {
      val c = cs.charAt(i)
      if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
      else if (c == '(') { val (v, j) = parseString(cs, i); stack += Str(v); i = j }
      else if (c == '[') {
        val items = new ArrayBuffer[Operand]
        i += 1
        var done = false
        while (!done && i < n) {
          val ch = cs.charAt(i)
          if (ch == ']') { i += 1; done = true }
          else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t') i += 1
          else if (ch == '(') { val (v, j) = parseString(cs, i); items += Str(v); i = j }
          else {
            val (tok, j) = readToken(cs, i)
            toNum(tok).foreach(v => items += Num(v))
            i = j
          }
        }
        stack += Arr(items.toList)
      } else if (c == '/') {
        val (tok, j) = readToken(cs, i + 1)
        stack += Name(tok)
        i = j
      } else {
        val (tok, j) = readToken(cs, i)
        i = j
        toNum(tok) match {
          case Some(v) => stack += Num(v)
          case None    => if (tok.nonEmpty) op(tok) else i += 1
        }
      }
    }
    runs
  }

  private def toNum(tok: String): Option[Double] =
    if (tok.nonEmpty && (tok.charAt(0).isDigit || tok.charAt(0) == '-' || tok.charAt(0) == '.'))
      try Some(tok.toDouble) catch { case _: NumberFormatException => None }
    else None

  private def readToken(cs: String, start: Int): (String, Int) = {
    var i = start
    val n = cs.length
    val sb = new StringBuilder
    while (i < n && !" \n\r\t()[]/<>".contains(cs.charAt(i))) { sb.append(cs.charAt(i)); i += 1 }
    if (i == start) (sb.toString, i + 1) else (sb.toString, i)
  }

  /** PDF literal string with escapes + balanced nested parens. Returns
    * (decoded, index after closing paren).
    */
  private[pdf] def parseString(cs: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = cs.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            var k = 0
            while (j < n && k < 3 && cs.charAt(j) >= '0' && cs.charAt(j) <= '7') { v = v * 8 + (cs.charAt(j) - '0'); j += 1; k += 1 }
            sb.append(v.toChar); i = j
          case _ => sb.append(e); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  // ---- x-y cut assembly --------------------------------------------------

  private val yTol = 2.0
  private val colGap = 100.0

  /** Returns (pageText, nLines). */
  private def assemblePage(runs: ArrayBuffer[Run]): (String, Int) = {
    if (runs.isEmpty) return ("", 0)
    val lines = new ArrayBuffer[String]
    xyCut(runs.toVector, lines)
    (lines.mkString("\n"), lines.length)
  }

  private def xyCut(runs: Vector[Run], out: ArrayBuffer[String]): Unit = {
    if (runs.isEmpty) return
    // column split: cluster distinct x-starts, split at largest gap >= colGap
    val xs = runs.map(_.x).distinct.sorted
    var splitAt = -1.0
    var bestGap = 0.0
    var i = 1
    while (i < xs.length) {
      val gap = xs(i) - xs(i - 1)
      if (gap >= colGap && gap > bestGap) { bestGap = gap; splitAt = xs(i) }
      i += 1
    }
    if (splitAt > 0) {
      val (left, right) = runs.partition(_.x < splitAt)
      // only treat as columns when both sides have vertically-overlapping
      // content; otherwise it's indentation, keep single flow
      if (left.nonEmpty && right.nonEmpty && overlapsY(left, right)) {
        xyCut(left, out); xyCut(right, out)
        return
      }
    }
    // single column: cluster runs into lines by y (desc), x asc within line
    val sorted = runs.sortBy(r => (-r.y, r.x))
    var j = 0
    while (j < sorted.length) {
      val y0 = sorted(j).y
      var k = j
      while (k < sorted.length && math.abs(sorted(k).y - y0) <= yTol) k += 1
      val line = sorted.slice(j, k).sortBy(_.x).map(_.text).mkString(" ")
      if (line.trim.nonEmpty) out += line
      j = k
    }
  }

  private def overlapsY(a: Vector[Run], b: Vector[Run]): Boolean = {
    val aMin = a.map(_.y).min; val aMax = a.map(_.y).max
    val bMin = b.map(_.y).min; val bMax = b.map(_.y).max
    math.min(aMax, bMax) - math.max(aMin, bMin) > -yTol
  }
}
