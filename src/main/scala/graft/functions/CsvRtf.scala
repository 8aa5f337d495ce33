package graft.functions

import scala.collection.mutable.ArrayBuffer

/** CSV extraction kernel (SURVEY.md §2.7 F5). Reference contract
  * (enhanced_extract.py:434-458): csv.reader, skip empty rows, cells joined
  * "\t", rows joined "\n", utf-8 then latin-1. Parser is RFC-4180-lite:
  * double-quoted fields, "" escapes, bare CR/LF row breaks.
  */
object CsvKernel {

  /** Parse decoded CSV text into rows of cells. */
  def parse(text: String): ArrayBuffer[ArrayBuffer[String]] = {
    val rows = new ArrayBuffer[ArrayBuffer[String]]
    var row = new ArrayBuffer[String]
    val cell = new StringBuilder
    var inQuotes = false
    var cellStarted = false // row has any content (incl. empty cells after a comma)
    var i = 0
    val n = text.length
    def endCell(): Unit = { row += cell.toString; cell.clear() }
    def endRow(): Unit = {
      if (cellStarted || cell.nonEmpty || row.nonEmpty) { endCell(); rows += row; row = new ArrayBuffer[String] }
      cellStarted = false
    }
    while (i < n) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && text.charAt(i + 1) == '"') { cell.append('"'); i += 2 }
          else { inQuotes = false; i += 1 }
        } else { cell.append(c); i += 1 }
      } else c match {
        case '"' => inQuotes = true; cellStarted = true; i += 1
        case ',' => endCell(); cellStarted = true; i += 1
        case '\r' =>
          if (i + 1 < n && text.charAt(i + 1) == '\n') i += 2 else i += 1
          endRow()
        case '\n' => endRow(); i += 1
        case other => cell.append(other); cellStarted = true; i += 1
      }
    }
    endRow()
    rows
  }

  /** Full contract: parse → skip empty rows → \t / \n render. */
  def extract(text: String): (String, Int) = {
    val rows = parse(text).filter(_.nonEmpty)
    (rows.map(_.mkString("\t")).mkString("\n"), rows.length)
  }
}

/** RTF extraction kernel (SURVEY.md §2.7 F6) — the reference's FALLBACK path
  * verbatim (enhanced_extract.py:473-481): strip control words
  * `\\[a-z]+\d*\s?` (one optional trailing whitespace consumed), strip all
  * braces, then trim lines / drop blanks / join "\n".
  */
object RtfKernel {
  private val controlWord = """\\[a-z]+\d*\s?""".r

  def extract(text: String): (String, Int) = {
    val noControls = controlWord.replaceAllIn(text, "")
    val noBraces = noControls.replace("{", "").replace("}", "")
    val out = TextAssembly.cleanLines(noBraces)
    (out, if (out.isEmpty) 0 else out.count(_ == '\n') + 1)
  }
}
