package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkStrategy

/** Whole-operator custom planning for the temporal/as-of join — the
  * SURVEY.md §7.3(c) path: logical node + SparkStrategy + physical operator,
  * registered through SparkSessionExtensions.
  *
  * Reference semantics: StreamExecTemporalJoin.scala:56 /
  * TemporalRowTimeJoinOperator.java:77 — join each left row with the right
  * side's latest version whose time ≤ the left row's time
  * (latestRightRowToJoin:332-355 does a binary search over buffered
  * versions).
  *
  * Why a custom operator instead of the compositional form (left-join all
  * earlier versions + ROW_NUMBER()=1): the compositional plan materializes
  * every (left row × earlier version) pair before discarding all but one —
  * O(L × V_k) rows through the shuffle and the window sort. This operator
  * asks the planner for co-partitioning on the key and (key, time) ordering
  * — the same contract SortMergeJoinExec declares — then a single forward
  * merge pass per partition picks each left row's version in O(L + R),
  * holding exactly ONE buffered version row. At 100 TB the difference is a
  * shuffle of pairs vs a shuffle of inputs.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    strict: Boolean, inner: Boolean = false) extends BinaryNode {
  // left (outer) mode null-pads the right side when a left row precedes
  // every right version; inner mode (the reference's plain
  // `JOIN ... FOR SYSTEM_TIME`, TemporalJoinITCase.scala:500 vs :344 for
  // the LEFT form) drops such rows, so the right output stays non-null
  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output
                    else right.output.map(_.withNullability(true)))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        strict: Boolean, inner: Boolean) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output
                    else right.output.map(_.withNullability(true)))

  // co-partition on the join key (EnsureRequirements inserts the exchanges)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition (key, time) order (EnsureRequirements inserts the sorts)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      var rHead: InternalRow = if (rit.hasNext) rit.next() else null
      // the single buffered version: latest right row seen for curKey
      var verKey: Any = null
      var version: InternalRow = null
      val merged = lit.map { lrow =>
        val k = lKey.eval(lrow)
        val t = lTime.eval(lrow)
        // advance the right cursor up to (key, time): every row passed with
        // our key becomes the newer buffered version
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rKey.eval(rHead)
          val cmpK = keyOrd.compare(rk, k)
          if (cmpK < 0) { rHead = if (rit.hasNext) rit.next() else null }
          else if (cmpK == 0 && {
            val c = timeOrd.compare(rTime.eval(rHead), t)
            if (strict) c < 0 else c <= 0
          }) {
            verKey = rk
            version = rHead.copy()
            rHead = if (rit.hasNext) rit.next() else null
          } else advancing = false
        }
        val matched = version != null && keyOrd.compare(verKey, k) == 0
        // inner mode drops unmatched lefts (null sentinel filtered below —
        // same single merge pass, no second scan)
        if (inner && !matched) null
        else proj(joined(lrow, if (matched) version else nullRight))
      }
      if (inner) merged.filter(_ != null) else merged
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoin logical → AsOfJoinExec physical. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, strict, inner) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, inner) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {
  /** Register with the session (GraftSession wires this in). */
  val extensions: SparkSessionExtensions => Unit = { ext =>
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PruneAsOfJoin)
  }
}
