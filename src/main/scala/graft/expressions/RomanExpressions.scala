package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen wrappers for the C1/C2 OMIM text kernels
  * ([[graft.text.Roman]], [[graft.text.Titles]]) — SURVEY §4's nominated
  * upgrade of the sanctioned-but-slower Scala UDFs: a `ScalaUDF` pays
  * catalyst↔Scala converters and a closure frame per row and can block
  * whole-stage codegen fusion, while these call the SAME static kernels
  * directly from generated code (semantics identical by construction —
  * the q29/q30 oracles pin them). */
object RomanKernels {
  def toRoman(n: Int): UTF8String =
    UTF8String.fromString(graft.text.Roman.toRoman(n))
  def fromRoman(s: UTF8String): Int =
    graft.text.Roman.fromRoman(s.toString)
  def cleanupTitle(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.text.Titles.cleanupTitle(s.toString, Map.empty))
}

/** arabic (1..4999) → roman numeral, ref romanplus.py toRoman. */
case class ToRomanExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an int column, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "to_roman"
  override def nullSafeEval(n: Any): Any =
    RomanKernels.toRoman(n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RomanKernels.toRoman($c)")
  override protected def withNewChildInternal(c: Expression): ToRomanExpr =
    copy(child = c)
}

/** Greedy front parse of a roman numeral (trailing suffix ignored), ref
  * romanplus.py fromRoman. */
case class FromRomanExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "from_roman"
  override def nullSafeEval(s: Any): Any =
    RomanKernels.fromRoman(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RomanKernels.fromRoman($c)")
  override protected def withNewChildInternal(c: Expression): FromRomanExpr =
    copy(child = c)
}

/** The C1 cleanup_title pipeline (capitalization, roman arabization,
  * acronym recapitalization) as one codegen call. */
case class CleanupTitleExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "cleanup_title"
  override def nullSafeEval(s: Any): Any =
    RomanKernels.cleanupTitle(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RomanKernels.cleanupTitle($c)")
  override protected def withNewChildInternal(c: Expression): CleanupTitleExpr =
    copy(child = c)
}
