package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Vector math over `array<float>` embedding columns.
  *
  * `dot`/`norm` delegate to the native codegen'd FloatVectorDot expression
  * (graft.functions) — a tight primitive loop inside whole-stage codegen.
  * The higher-order-function formulation is kept as `dotHof` for
  * equivalence testing: both accumulate in double precision in array
  * order, so they are bit-identical to each other and to DuckDB's
  * list_cosine_similarity on the same floats.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column = VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = VectorFunctions.vec_norm(a)

  /** dot/(|a|·|b|) can exceed 1.0 by an ulp for IDENTICAL vectors
    * (sqrt(n)² rounds below n, the division rounds past 1) — exactly the
    * duplicate pairs a dedup pipeline exists to find. Cosine is in
    * [-1, 1] by definition, so clamp; DuckDB's list_cosine_similarity
    * clamps the same way for real values (verified bitwise), and
    * in-range values pass through bit-unchanged. NaN (poisoned
    * embeddings) stays NaN — Spark's least/greatest would turn it into
    * 1.0 (NaN orders above all doubles), silently promoting garbage to a
    * perfect match; the callers' "NaN orders last / excluded" handling
    * depends on NaN surviving. Codegen CSEs the doubled reference. */
  private def clamp(c: Column): Column =
    when(isnan(c), c).otherwise(least(greatest(c, lit(-1.0)), lit(1.0)))

  def cosine(a: Column, b: Column): Column = clamp(dot(a, b) / (norm(a) * norm(b)))

  /** Cosine from precomputed per-side norms — use in joins so each pair
    * costs one dot instead of three. */
  def cosinePrenorm(a: Column, b: Column, normA: Column, normB: Column): Column =
    clamp(dot(a, b) / (normA * normB))

  /** Fixed-point quantization array<float> → array<long>: one native
    * pass per row, Spark round()/cast-exact (the integer-moment front
    * door — see graftext.FloatVectorQuantize for why neither a transform
    * lambda nor post-explode scalar round() is acceptable here). */
  def quantize(a: Column, scale: Double): Column =
    VectorFunctions.vec_quantize(a, scale)

  /** Reference higher-order-function implementation (interpreted lambdas;
    * ~6× slower in pair joins). Kept for cross-checking the native expr. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private[graft] def norm2Hof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Reference HOF form of [[quantize]] (interpreted transform over
    * Spark's own round/cast). Kept for the VectorExprSpec parity pin. */
  private[graft] def quantizeHof(a: Column, scale: Double): Column =
    transform(a, x => round(x.cast("double") * lit(scale)).cast("long"))
}
