package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Exists, Expression, NamedExpression, Or, PredicateHelper, SubExprUtils}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Distribute a correlated EXISTS over a top-level disjunction in its
  * subquery filter — the decorrelation pre-rewrite Spark lacks.
  *
  * `EXISTS (SELECT ... WHERE p1 OR p2)` ≡ `EXISTS(... WHERE p1) OR
  * EXISTS(... WHERE p2)` (existential quantification distributes over
  * disjunction), and the rewrite matters because Catalyst can only
  * decorrelate predicate subqueries whose correlated conjuncts sit at the
  * TOP level of the filter: with the correlation under an OR — e.g. the
  * un-parenthesized `EXISTS(SELECT 1 FROM t WHERE corr = x AND a OR b)`,
  * which parses as `(corr AND a) OR b` — Spark 4.1 aborts with an internal
  * `None.get` during subquery rewrite, while Calcite-based engines run it
  * (the reference decorrelates via
  * flink-table-planner-blink/.../rules/logical/FlinkSubQueryRemoveRule.scala,
  * whose RelDecorrelator handles disjunctive correlation). After the split,
  * each branch either carries its correlation as a top-level conjunct
  * (plain semi-join decorrelation) or is uncorrelated; an OR of several
  * EXISTS is a shape Spark already executes via ExistenceJoin.
  *
  * Fires only when the subquery's filter is an `Or` that CONTAINS an outer
  * reference — correlation not under a disjunction is left to Catalyst
  * untouched. NOT EXISTS needs no special case: the parser wraps the same
  * Exists in a Not, and Not(e1 OR e2) is handled by boolean simplification
  * plus ExistenceJoin. Found by differential-fuzzer family 19 (the shapes
  * its grammar previously had to parenthesize away); fixed-point
  * application splits nested disjunctions branch by branch.
  */
object SubqueryOrRewrite {

  val extensions: SparkSessionExtensions => Unit = { ext =>
    ext.injectResolutionRule(_ => DistributeExistsOverOr)
  }

  object DistributeExistsOverOr extends Rule[LogicalPlan] with PredicateHelper {

    /** The per-disjunct subquery plans, or None when no split applies.
      * Matches the filter directly under the Exists, or under the
      * Project the parser adds for `SELECT <exprs> FROM ...`. */
    private def branchPlans(plan: LogicalPlan): Option[Seq[LogicalPlan]] =
      plan match {
        case p @ Project(list, Filter(cond @ Or(_, _), child))
            if p.resolved && SubExprUtils.containsOuter(cond) =>
          Some(splitDisjunctivePredicates(cond)
            .map(d => Project(list, Filter(d, child))))
        case f @ Filter(cond @ Or(_, _), child)
            if f.resolved && SubExprUtils.containsOuter(cond) =>
          Some(splitDisjunctivePredicates(cond).map(d => Filter(d, child)))
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressionsWithPruning(
        _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.EXISTS_SUBQUERY)) {
        case e: Exists if e.joinCond.isEmpty =>
          branchPlans(e.plan) match {
            case Some(plans) =>
              plans.map { p =>
                // outerAttrs recomputed per branch: a branch that lost its
                // correlated disjunct must not claim to be correlated
                Exists(p, SubExprUtils.getOuterReferences(p),
                  NamedExpression.newExprId, Seq.empty, e.hint)
              }.reduceLeft[Expression](Or(_, _))
            case None => e
          }
      }
  }
}
