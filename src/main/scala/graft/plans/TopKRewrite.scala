package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the relational top-k idiom
  *
  *   Project(cols, Filter(rn <= k, Window([rn := row_number() over
  *     (PARTITION BY keys ORDER BY ord)], keys, ord, child)))
  *
  * into the custom bounded operator, `Project(cols,
  * TopKPerKeyPlan(keys, ord, k, child))` — the BpeCountRewrite
  * discipline one tier up: users keep writing the standard window SQL
  * and the planner swaps in the heap operator (no per-partition sort,
  * k-per-key-per-partition shuffle bound; see [[TopKPerKeyExec]]).
  *
  * Fires only when the rewrite is exactly semantics-preserving:
  *   - the window computes a single `row_number` (rank/dense_rank keep
  *     ties and are NOT this operator's semantics),
  *   - the filter is `rn <= k` / `rn < k+1` / `rn = 1` on that column,
  *   - the projection above DROPS the rank column (the operator does
  *     not emit one),
  *   - the partition spec is non-empty (ClusteredDistribution needs
  *     keys; a global top-k is already Spark's TakeOrderedAndProject).
  *
  * Row_number over a non-total order is nondeterministic among ties in
  * BOTH spellings, so the rewrite preserves the (already weak)
  * contract; with a total order both are deterministic and equal.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) =>
      Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) =>
      Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rnAttr = w.windowExpressions.head.toAttribute
      limitOf(cond, rnAttr) match {
        case Some(k) if k >= 1 &&
            projectList.forall(!_.references.contains(rnAttr)) =>
          Project(projectList, TopKPerKeyPlan(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
