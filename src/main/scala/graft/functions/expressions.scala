package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for hot-path scalar kernels — codegen'd, so
  * they stay inside WholeStageCodegen spans (preferred over Scala UDFs per
  * the graft's Spark-first rules; see also SNIPPETS.md pattern notes).
  */
object expressions {

  /** 64-bit content fingerprint (TextStats.fingerprint64) as a native
    * expression: whole-stage codegen emits a static call, no UDF
    * serialization boundary.
    */
  case class Fingerprint64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "fingerprint64"

    override def nullSafeEval(input: Any): Any =
      TextStats.fingerprint64(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.fingerprint64($c.toString())")

    override protected def withNewChildInternal(newChild: Expression): Fingerprint64 = copy(newChild)
  }

  /** Cosine similarity between two array<float> embeddings — tight primitive
    * loop in generated code; returns double; null when lengths differ.
    */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val res = CosineSim.compute(a, b)
      if (java.lang.Double.isNaN(res)) null else res
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |double ${ev.value}_r = graft.functions.expressions.cosineOnArrayData($a, $b);
           |if (Double.isNaN(${ev.value}_r)) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
      copy(newLeft, newRight)
  }

  object CosineSim {
    def compute(a: ArrayData, b: ArrayData): Double = cosineOnArrayData(a, b)
  }

  /** Static helper target for generated code (NaN = null sentinel). */
  def cosineOnArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) return Double.NaN
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hamming distance between two int64 signatures (SimHash neighbor test). */
  case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hamming64"

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hamming64 =
      copy(newLeft, newRight)
  }

  // ---- Column API ----------------------------------------------------------

  def fingerprint64(c: Column): Column = ExpressionUtils.column(Fingerprint64(ExpressionUtils.expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def hamming64(a: Column, b: Column): Column =
    ExpressionUtils.column(Hamming64(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL surface: SELECT fingerprint64(text), cosine_sim(e1, e2), ... */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fingerprint64", es => Fingerprint64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64", es => Hamming64(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => UnicodeNorm.Normalize(es.head, compat = false), "scala_udf")
    reg.createOrReplaceTempFunction("nfkc_normalize",
      es => UnicodeNorm.Normalize(es.head, compat = true), "scala_udf")
  }
}
