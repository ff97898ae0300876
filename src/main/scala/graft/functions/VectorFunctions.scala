package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `ArrayType(FloatType)` embedding
  * columns, computed in double precision with strict left-to-right
  * accumulation (bitwise-reproducible across engines — verified identical
  * to DuckDB's list_dot_product).
  *
  * Pure `functions._` composition: stays in whole-stage codegen, no UDF.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product with left-to-right double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN when either vector is all-zero (caller filters). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
