package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Unit-normalize an `array<double>` vector: one pass for the squared norm,
  * one for the division — semantically `transform(e, x -> x /
  * sqrt(dot(e, e)))` but immune to Catalyst's CollapseProject inlining the
  * norm INTO the lambda (which silently re-evaluates the dot product once
  * per element: O(d²) per row; observed in the q26 physical plan before
  * this expression existed). Zero vectors normalize to NaN components,
  * matching the column-composition semantics.
  */
case class NormalizeVector(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_vector expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalize_vector"

  override def nullSafeEval(a: Any): Any =
    NormalizeVector.kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeVector.kernel($c)")

  override protected def withNewChildInternal(c: Expression): NormalizeVector =
    copy(child = c)
}

object NormalizeVector {
  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getDouble(i); s += v * v; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }
}
