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
  * `java.text.Normalizer` is the reference implementation of UAX #15, so
  * the kernel is one static call, fast-pathed by `Normalizer.isNormalized`
  * (ASCII and already-composed text — the overwhelming majority of a web
  * corpus — skips the allocation entirely).
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

  case class Normalize(child: Expression, compat: Boolean) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = if (compat) "nfkc_normalize" else "nfc_normalize"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      UTF8String.fromString(if (compat) nfkc(s) else nfc(s))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (compat) "nfkc" else "nfc"
      defineCodeGen(ctx, ev,
        c => s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.UnicodeNorm.$fn($c.toString()))")
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
