package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, expressed as pure
  * Catalyst higher-order functions (zip_with / aggregate) — fully
  * codegen-friendly, no UDFs, and a sequential left-fold summation order
  * that matches DuckDB's `list_dot_product` for oracle parity.
  */
object VectorFns {

  /** Cast an array<float> column to array<double> so all downstream math
    * is double-precision in both engines (float→double is exact).
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + left-fold aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; callers are expected to pass toDouble()'d arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
