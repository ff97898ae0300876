package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen wrappers for [[graft.text.UnicodeNorm]] — Spark has no built-in
  * UAX #15 normalization, and a hygiene pass normalizes EVERY document, so
  * the kernel must stay inside whole-stage codegen (a ScalaUDF here would
  * put catalyst↔Scala converters on the hottest map stage of the corpus
  * pipeline). Same static-kernel pattern as [[RomanKernels]].
  */
object UnicodeKernels {
  /** Fast path: most real text is already NFC — `isNormalized` is a scan
    * without allocation, so normalized rows pay no copy. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = graft.text.UnicodeNorm.nfc(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = graft.text.UnicodeNorm.nfkc(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
}

private[expressions] trait UnicodeNormExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
}

/** Unicode NFC (canonical composition), UAX #15. */
case class NfcNormalizeExpr(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(s: Any): Any =
    UnicodeKernels.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

/** Unicode NFKC (compatibility composition), UAX #15. */
case class NfkcNormalizeExpr(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfkc_normalize"
  override def nullSafeEval(s: Any): Any =
    UnicodeKernels.nfkc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeKernels.nfkc($c)")
  override protected def withNewChildInternal(c: Expression): NfkcNormalizeExpr =
    copy(child = c)
}
