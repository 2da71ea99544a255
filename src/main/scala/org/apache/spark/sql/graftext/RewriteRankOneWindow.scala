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
  * into a grouped `min_by` aggregation, with map-side partial
  * aggregation so the shuffle carries at most one row per (group,
  * mapper).
  *
  * MEASURED HONESTLY (graft.RuleBench): on Spark 4 the window form
  * already gets the same map-side reduction from InsertWindowGroupLimit
  * (both plans shuffle identical record counts), so the remaining win is
  * replacing the reduce-side sort+window of the reduced rows with a
  * sort-aggregate — ~neutral wall-clock at local bench sizes. The rule
  * earns its keep as (a) the guarded whole-plan-rewrite pattern this
  * engine would extend for idioms WindowGroupLimit does NOT cover, and
  * (b) a win on engines/configs without window-group-limit pushdown.
  * The matched WindowGroupLimit child is dropped (min_by recomputes the
  * winner; keeping it would only re-add its sort requirement).
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
