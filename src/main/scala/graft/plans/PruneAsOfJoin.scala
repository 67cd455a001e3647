package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (SURVEY.md §7.3's Rule[LogicalPlan] layer):
  * column pruning through the AsOfJoin node.
  *
  * Catalyst's ColumnPruning only understands its own operators — a foreign
  * logical node is a pruning barrier, so `SELECT two columns FROM wide_left
  * ASOF JOIN wide_right` would drag every column of both sides through the
  * hash exchange and the (key, time) sort. This rule pushes the projection
  * into both children, keeping what the projection references plus the
  * join's key/time expressions — the same contract Catalyst applies to its
  * own joins. At 100 TB, shuffle bytes scale with the pruned width, which
  * is the whole game.
  *
  * Mirrors the reference's PROJECT_RULES / ProjectJoinTransposeRule reach
  * into its temporal-join node (FlinkStreamRuleSets.scala:202).
  */
object PruneAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, aj @ AsOfJoin(l, r, lk, rk, lt, rt, strict, inner)) =>
      val required = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(lk, rk, lt, rt).flatMap(_.references))
      val keepL = l.output.filter(required.contains)
      val keepR = r.output.filter(required.contains)
      if (keepL.size == l.output.size && keepR.size == r.output.size) p
      else Project(projList,
        AsOfJoin(Project(keepL, l), Project(keepR, r), lk, rk, lt, rt, strict, inner))
  }
}
