package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, Expression, ExpectsInputTypes, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Column API over Spark's own sketch expressions (the machinery behind
  * runtime bloom-filter joins) plus a point-query expression for
  * CountMinSketch — the pieces `org.apache.spark.sql.functions` doesn't
  * expose publicly.
  *
  * Lives in the spark namespace for the same reason as the other graftext
  * files: `BloomFilterAggregate`/`BloomFilterMightContain` are
  * catalyst-internal, and `ExpressionUtils.column` is `private[sql]`.
  *
  * Hashing contract: both the bloom build side and the probe side wrap the
  * value in the SAME `XxHash64` (seed 42) long hash — `BloomFilterAggregate`
  * stores longs via `putLong` and `BloomFilterMightContain` probes via
  * `mightContainLong`, so a hash mismatch between the two sides would
  * silently probe garbage. Keeping both wraps inside this object makes the
  * contract un-breakable from call sites.
  */
object SketchColumns {

  /** Distributed bloom-filter build as an aggregate: one partial bloom per
    * partition, OR-merged — never a driver-side item loop. `expectedItems`
    * sizes the bit array for the target false-positive rate (Spark derives
    * numBits as items × 8 by default ≈ 3% FP). */
  def bloom_agg(value: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(value))),
        expectedItems).toAggregateExpression())

  /** Map-side bloom probe: true if `value` MIGHT be in the filter (no false
    * negatives — every true member passes; a tunable fraction of
    * non-members also passes and must be removed by an exact verify).
    * `bloomBytes` is the serialized filter from [[bloom_agg]], shipped as a
    * literal (task-broadcast with the plan — KBs to low MBs). */
  def bloom_might_contain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(value)))))

  /** Point estimate from a serialized CountMinSketch built by
    * `functions.count_min_sketch` over LONG values (hash string keys with
    * `xxhash64` on BOTH the build and estimate sides — same contract as the
    * bloom pair above). Returns the estimated occurrence count:
    * `true_count <= estimate <= true_count + eps·N` with the sketch's
    * confidence. */
  def cms_estimate(sketchBytes: Array[Byte], hashedValue: Column): Column =
    ExpressionUtils.column(
      CmsEstimate(Literal(sketchBytes, BinaryType),
        ExpressionUtils.expression(hashedValue)))
}

/** `estimateCount` over a serialized CountMinSketch. The sketch literal is
  * deserialized ONCE per task (transient lazy) — not per row. Interpreted
  * eval (CodegenFallback): the expression runs over candidate key lists
  * (distinct heavy-hitter candidates), never in a corpus-scan hot path.
  *
  * `left` must be a foldable binary (the serialized sketch); `right` is the
  * xxhash64-hashed key, matching a sketch built over the same hash. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "cms_estimate: sketch bytes are null")
    CountMinSketch.readFrom(bytes)
  }

  override def nullSafeEval(sk: Any, hashed: Any): Any =
    sketch.estimateCount(java.lang.Long.valueOf(hashed.asInstanceOf[Long]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
