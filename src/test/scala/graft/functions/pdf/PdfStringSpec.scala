package graft.functions.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Literal-string lexing details of the content-stream tokenizer
  * (package-private surface, hence this package).
  */
class PdfStringSpec extends AnyFunSuite {

  test("string line continuation handles backslash-CR and backslash-CRLF (ADVICE r5)") {
    // PDF 32000-1 §7.3.4.2: a REVERSE SOLIDUS before an EOL continues the
    // line for every EOL form — LF, CR, and CRLF; CRLF writers previously
    // leaked a literal CR into the extracted text
    assert(PdfExtractor.parseString("(a\\\nb)", 0)._1 == "ab")
    assert(PdfExtractor.parseString("(a\\\rb)", 0)._1 == "ab")
    assert(PdfExtractor.parseString("(a\\\r\nb)", 0)._1 == "ab")
    // a bare (unescaped) CR is data, not continuation — unchanged
    assert(PdfExtractor.parseString("(a\rb)", 0)._1 == "a\rb")
    // escaped-escape before CR: the backslash is consumed as data, the CR
    // stays data
    assert(PdfExtractor.parseString("(a\\\\\rb)", 0)._1 == "a\\\rb")
  }
}
