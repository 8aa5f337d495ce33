package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.html.CodeBlocks

class CodeBlocksSpec extends AnyFunSuite {

  test("whitespace preserved verbatim; language from pre or code class; entities decoded") {
    val html = "<pre class=\"language-python\">\ndef f(x):\n    return x &amp; 1\n</pre>" +
      "<p>prose</p><pre><code class=\"lang-js\">let x = 1;\n  let y = 2;</code></pre>"
    val got = CodeBlocks.extract(html)
    assert(got.length == 2)
    assert(got(0).lang == "python")
    assert(got(0).text == "def f(x):\n    return x & 1\n") // indentation intact, & decoded
    assert(got(1).lang == "js")
    assert(got(1).text == "let x = 1;\n  let y = 2;")
    assert(got.map(_.order) == Seq(0, 1))
  }

  test("inline code ignored; nested pre flattened; syntax-highlight spans flattened; br = newline") {
    assert(CodeBlocks.extract("<p>use <code>grep</code> here</p>").isEmpty)
    val nested = CodeBlocks.extract("<pre>a<pre>b</pre>c</pre>")
    assert(nested.map(_.text) == Seq("abc"))
    val spans = CodeBlocks.extract(
      "<pre><code><span class=\"kw\">def</span> <span>f</span>():<br>  pass</code></pre>")
    assert(spans.map(_.text) == Seq("def f():\n  pass"))
  }

  test("script/style decoys never captured; empty blocks dropped; unclosed pre flushes; null safe") {
    assert(CodeBlocks.extract("<script>var x = '<pre>no</pre>';</script>").isEmpty)
    assert(CodeBlocks.extract("<pre>   \n </pre>").isEmpty)
    assert(CodeBlocks.extract("<pre class=\"lang-go\">func main() {").map(b => (b.lang, b.text)) ==
      Seq(("go", "func main() {")))
    assert(CodeBlocks.extract(null).isEmpty)
    assert(CodeBlocks.extract("").isEmpty)
  }

  test("first code child's class wins only when pre has no language; pre class beats code class") {
    val preWins = CodeBlocks.extract(
      "<pre class=\"language-rust\"><code class=\"language-c\">fn x()</code></pre>")
    assert(preWins.head.lang == "rust")
    val undeclared = CodeBlocks.extract("<pre><code>plain</code></pre>")
    assert(undeclared.head.lang == "")
  }
}
