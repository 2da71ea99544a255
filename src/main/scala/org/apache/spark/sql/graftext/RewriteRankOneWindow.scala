package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the rank-1 window idiom
  *
  *   ... WHERE row_number() OVER (PARTITION BY p ORDER BY k ASC) = 1
  *
  * into a grouped `min_by` aggregation. The window form shuffles EVERY
  * raw row on p and then sorts whole partitions; the aggregate form runs
  * map-side partial `min_by` first, so the shuffle carries at most one
  * row per (group, mapper) — at 100 TB that is the difference between
  * moving the corpus and moving the group cardinality. (The struct-valued
  * buffer plans as SortAggregate, whose sorts are on the group keys of
  * already-reduced data — the raw-data movement is what this removes.
  * Spark's own WindowGroupLimit prunes rows before the shuffle but still
  * ships one row per group per mapper AND sorts each reduce partition;
  * the aggregate form subsumes it, so the matched WindowGroupLimit child
  * is dropped.)
  *
  * Fires only when provably equivalent, i.e. ALL of:
  *  - a single row_number window expression, filtered to exactly `= 1`;
  *  - ascending NULLS FIRST ordering (the default) on an atomic-typed
  *    attribute. Nullable keys (every parquet-sourced column) are handled
  *    by encoding null-first as a (null-flag, coalesced-key) struct
  *    ordering — min_by alone would IGNORE null keys while row_number
  *    sorts them first;
  *  - a non-empty PARTITION BY of plain attributes (a global Aggregate
  *    fabricates one all-null row on empty input; the window emits none).
  *
  * The surviving row is taken as ONE `min_by(struct(cols), k)` — never
  * per-column min_bys, which would tear fields across ordering ties.
  * Output attribute ids are preserved (the rank column becomes a literal
  * 1), so the rewrite is transparent to every parent operator.
  */
object RewriteRankOneWindow extends Rule[LogicalPlan] {

  private def isRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part,
              Seq(SortOrder(okey: AttributeReference, Ascending, NullsFirst, _)),
              _)), _)),
          _, _, child, _))
        if part.nonEmpty && // empty PARTITION BY: a global Aggregate emits
          // one all-null row on EMPTY input where the window emits none —
          // not equivalent, so a global rank-1 is left alone
          part.forall(_.isInstanceOf[AttributeReference]) &&
          okey.dataType.isInstanceOf[org.apache.spark.sql.types.AtomicType] &&
          isRankOne(cond, alias.toAttribute) &&
          child.output.exists(_.exprId == okey.exprId) => {
      // Spark's InsertWindowGroupLimit has usually already wrapped the
      // child; drop it — its physical operator demands sorted input, which
      // is exactly the cost this rewrite removes, and min_by recomputes
      // the winner itself
      val aggChild = child match {
        case wgl: WindowGroupLimit => wgl.child
        case other => other
      }
      // Nullable ordering key (every parquet-sourced attribute): encode
      // ASC NULLS FIRST as a struct ordering — a null-key row gets
      // (0, default), any non-null row (1, k), so min_by picks a null-key
      // row first, exactly like row_number's sort. Non-nullable keys use
      // the key directly.
      val ordering: Expression =
        if (okey.nullable)
          CreateStruct(Seq(
            If(IsNull(okey), Literal(0), Literal(1)),
            Coalesce(Seq(okey, Literal.default(okey.dataType)))))
        else okey
      val partAttrs = part.map(_.asInstanceOf[AttributeReference])
      val others = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
      if (others.isEmpty) {
        // nothing beyond the group keys to carry: dedup the keys
        val agg = Aggregate(partAttrs, partAttrs, aggChild)
        Project(child.output :+ Alias(Literal(1), alias.name)(exprId = alias.exprId), agg)
      } else {
        val minRow = Alias(
          AggregateExpression(
            MinBy(CreateStruct(others.toIndexedSeq), ordering), Complete, isDistinct = false),
          "_graft_rank1_row")()
        val agg = Aggregate(partAttrs, partAttrs :+ minRow, aggChild)
        val minAttr = minRow.toAttribute
        val out = (child.output :+ alias.toAttribute).map { a =>
          if (a.exprId == alias.exprId)
            Alias(Literal(1), a.name)(exprId = a.exprId)
          else if (partAttrs.exists(_.exprId == a.exprId)) a
          else {
            val idx = others.indexWhere(_.exprId == a.exprId)
            Alias(GetStructField(minAttr, idx, Some(others(idx).name)), a.name)(
              exprId = a.exprId)
          }
        }
        Project(out, agg)
      }
    }
  }
}
