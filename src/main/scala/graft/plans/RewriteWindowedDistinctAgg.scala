package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's Task-8/10/11 anti-pattern
  * (SURVEY §4.3; `BatchProcessingFinal.ipynb:6213-6217`):
  *
  * {{{
  * SELECT DISTINCT part_cols, agg(x) OVER (PARTITION BY part_cols)
  * }}}
  *
  * computes the aggregate once per INPUT ROW (full window exec: shuffle
  * + sort + per-row aggregate state), then collapses the duplicates
  * with a second shuffle. The equivalent
  * `GROUP BY part_cols → agg(x)` is one partial+final hash aggregate —
  * map-side combined, no sort, no per-row duplication.
  *
  * The shapes are semantically identical whenever the projection below
  * the DISTINCT keeps only partition columns plus the window result
  * (every input row of a partition carries the same aggregate value, so
  * DISTINCT collapses each partition to exactly the groupBy row).
  * Matched conservatively: single whole-partition window expression
  * (no ORDER BY, unbounded frame), deterministic non-DISTINCT non-FILTER
  * aggregate, attribute-only partition spec and projection.
  *
  * By the time user rules run, the optimizer has already turned
  * `Distinct` into `Aggregate(g, g, _)` (ReplaceDistinctWithAggregate),
  * so the match is on that form. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteWindowedDistinctAgg extends Rule[LogicalPlan] {

  private def wholePartitionFrame(spec: WindowSpecDefinition): Boolean =
    spec.orderSpec.isEmpty && (spec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case UnspecifiedFrame => true
      case _ => false
    })

  /** `Distinct` post-optimization: grouping == output == pass-through
    * attributes. */
  private def isDistinctShape(a: Aggregate): Boolean =
    a.aggregateExpressions.forall(_.isInstanceOf[Attribute]) &&
      a.groupingExpressions.map(_.canonicalized).toSet ==
        a.aggregateExpressions.map(_.canonicalized).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case outer @ Aggregate(_, _, Project(projList, w: Window), _)
        if isDistinctShape(outer) && w.orderSpec.isEmpty &&
          w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case winAlias @ Alias(WindowExpression(ae: AggregateExpression, spec), _)
            if wholePartitionFrame(spec) &&
              !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
              w.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
              projList.forall(_.isInstanceOf[Attribute]) &&
              projList.exists(_.exprId == winAlias.exprId) &&
              // the projected non-window attributes must be EXACTLY the
              // partition columns, both directions: a projection KEEPING
              // a non-partition column is a different query, and one
              // DROPPING a partition column relies on DISTINCT to
              // collapse rows the groupBy form would keep apart —
              // rewriting either silently changes results
              projList.filterNot(_.exprId == winAlias.exprId).forall(p =>
                w.partitionSpec.exists(_.asInstanceOf[Attribute].exprId == p.exprId)) &&
              w.partitionSpec.forall(p =>
                projList.exists(_.exprId == p.asInstanceOf[Attribute].exprId)) =>
          val partAttrs = w.partitionSpec.map(_.asInstanceOf[Attribute])
          // output attribute ids preserved (partition attrs pass through;
          // the aggregate reuses the window alias id) so parent operators
          // resolve unchanged
          val newAggExprs: Seq[NamedExpression] = projList.map {
            case a: Attribute if a.exprId == winAlias.exprId =>
              Alias(ae, winAlias.name)(exprId = winAlias.exprId)
            case other => other
          }
          Aggregate(partAttrs, newAggExprs, w.child)
        case _ => outer
      }
  }
}
