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
  *  - ascending NULLS FIRST ordering (the default) on a NON-NULLABLE
  *    attribute — with a nullable key, row_number picks a null-key row
  *    first while min_by ignores null keys: not equivalent;
  *  - partition keys are plain attributes.
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
        if !okey.nullable &&
          part.forall(_.isInstanceOf[AttributeReference]) &&
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
      val partAttrs = part.map(_.asInstanceOf[AttributeReference])
      val others = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
      if (others.isEmpty) {
        // nothing beyond the group keys to carry: dedup the keys
        val agg = Aggregate(partAttrs, partAttrs, aggChild)
        Project(child.output :+ Alias(Literal(1), alias.name)(exprId = alias.exprId), agg)
      } else {
        val minRow = Alias(
          AggregateExpression(
            MinBy(CreateStruct(others.toIndexedSeq), okey), Complete, isDistinct = false),
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
