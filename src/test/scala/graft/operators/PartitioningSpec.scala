package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Each partitioning verb must produce the matching exchange in the plan —
  * the physical contract, not just a row-preserving transform. */
class PartitioningSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  private def orders = graft.Tables.load(spark, sf, "orders")

  test("keyBy hashes on the key; rebalance round-robins; custom hashes the expression") {
    assert(planOf(Partitioning.keyBy(orders, col("o_custkey")))
      .contains("hashpartitioning(o_custkey"))
    assert(planOf(Partitioning.rebalance(orders, 4)).contains("RoundRobinPartitioning"))
    assert(planOf(Partitioning.partitionCustom(orders, 4, col("o_custkey") % 7))
      .contains("hashpartitioning((o_custkey"))
  }

  test("rescale and global coalesce without a shuffle") {
    val rescaled = Partitioning.rescale(orders, 2)
    val p = planOf(rescaled)
    assert(p.contains("Coalesce") && !p.contains("Exchange"),
      "rescale must merge locally, never shuffle")
    assert(Partitioning.global(orders).rdd.getNumPartitions == 1)
  }

  test("broadcastDim plans a broadcast-hash join") {
    val dim = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val p = planOf(Partitioning.broadcastDim(orders, dim, Seq("o_custkey")))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("all verbs preserve the row multiset") {
    val n = orders.count()
    assert(Partitioning.keyBy(orders, col("o_custkey")).count() == n)
    assert(Partitioning.rebalance(orders, 3).count() == n)
    assert(Partitioning.rescale(orders, 2).count() == n)
    assert(Partitioning.global(orders).count() == n)
    assert(Partitioning.forward(orders).count() == n)
  }
}
