package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.DotProduct

/** Column-level dense-vector math over `ArrayType(FloatType)` embedding
  * columns, computed in double precision with strict left-to-right
  * accumulation (bitwise-reproducible across engines — verified identical
  * to DuckDB's list_dot_product).
  *
  * The hot loop is the custom codegen [[graft.expressions.DotProduct]];
  * everything else is `functions._` composition. No UDFs.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Dot product with left-to-right double accumulation (codegen'd). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(asDouble(a)), expression(asDouble(b))))

  /** Reference HOF implementation of [[dot]] — same semantics, interpreted
    * eval; kept as the parity check for the codegen expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Unit-normalized copy (codegen kernel — a column-composition version
    * gets its norm inlined into the per-element lambda by CollapseProject,
    * silently going O(d²) per row; see graft.expressions.NormalizeVector).
    * Normalizing each side once before a similarity join turns every
    * pair-cosine into a single dot product — the O(pairs) term drops from
    * 3 array passes to 1. */
  def unit(a: Column): Column =
    column(graft.expressions.NormalizeVector(expression(asDouble(a))))

  /** Cosine similarity; NaN when either vector is all-zero (caller filters). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
