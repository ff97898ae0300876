package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` backend-agnostic and moved the classic
  * Column↔Expression conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Libraries that ship
  * custom Catalyst expressions (graft.expressions.*) still need the
  * conversion, so this object re-exports it from inside the sql package —
  * the conventional extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
