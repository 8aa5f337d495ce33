package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the missing
  * canonicalization step in front of every text-dedup/fingerprint operator:
  * composed `é` (U+00E9) and decomposed `e`+U+0301 are byte-different but
  * render identically, so un-normalized corpora leak duplicate documents
  * past exact-hash dedup and split token statistics across spellings. NFC
  * (canonical composition) is the dedup canonical form; NFKC additionally
  * folds compatibility variants (ligatures `ﬁ`, fullwidth `Ａ`, superscript
  * `²`) — the aggressive form tokenizer pipelines use.
  *
  * Spark has no built-in for this (`lower`/`trim` only); a Scala UDF would
  * break the WholeStageCodegen span around the dedup hash. The JDK's
  * `java.text.Normalizer` is the reference implementation of UAX #15.
  * Two fast paths keep the dominant web-corpus rows cheap: pure-ASCII
  * payloads are detected by a byte scan on the raw UTF8String and returned
  * BY REFERENCE (zero decode, zero allocation); non-ASCII text that is
  * already normalized pays one String decode for `isNormalized` but skips
  * the normalize + re-encode (the input UTF8String is returned unchanged).
  */
object UnicodeNorm {

  def nfc(s: String): String = {
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  def nfkc(s: String): String = {
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFKC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
  }

  /** ASCII bytes are NFC- and NFKC-invariant, so the scan licenses the
    * by-reference return below without decoding.
    */
  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if (u.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  /** UTF8String-in/UTF8String-out kernels the expression (eval AND codegen)
    * calls: allocation-free for ASCII, decode-only for already-normalized
    * text, full normalize + re-encode only when the row actually changes.
    */
  def nfcUtf8(u: UTF8String): UTF8String = {
    if (isAscii(u)) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  def nfkcUtf8(u: UTF8String): UTF8String = {
    if (isAscii(u)) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFKC)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
    }
  }

  case class Normalize(child: Expression, compat: Boolean) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = if (compat) "nfkc_normalize" else "nfc_normalize"

    override def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      if (compat) nfkcUtf8(u) else nfcUtf8(u)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (compat) "nfkcUtf8" else "nfcUtf8"
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.$fn($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Normalize =
      copy(child = newChild)
  }

  /** NFC-normalize a string column (canonical composition). */
  def nfcNorm(c: Column): Column =
    ExpressionUtils.column(Normalize(ExpressionUtils.expression(c), compat = false))

  /** NFKC-normalize a string column (compatibility + canonical). */
  def nfkcNorm(c: Column): Column =
    ExpressionUtils.column(Normalize(ExpressionUtils.expression(c), compat = true))
}
