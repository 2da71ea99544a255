package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order array functions (zip_with / aggregate) so everything stays
  * inside Catalyst — no UDF serialization, no Python.
  *
  * Accumulation is double-precision in array order, which matches DuckDB's
  * list_cosine_similarity on the same floats (verified bit-identical by the
  * oracle gate). A codegen'd native Expression is the planned upgrade for
  * the hot path (see functions/ package).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
