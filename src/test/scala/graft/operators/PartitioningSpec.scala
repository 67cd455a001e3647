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

  test("rescale: downscale merges locally without a shuffle, upscale exchanges") {
    // the sf0.001 parquet is a single row group → 1 input partition; fan it
    // out first so rescale-down has something to merge
    val wide = orders.repartition(8)
    val down = Partitioning.rescale(wide, 2)
    assert(down.rdd.getNumPartitions == 2)
    // Coalesce on an already-materialized width adds no Exchange of its own:
    // strip the parent repartition's exchange by checking the logical plan
    assert(down.queryExecution.logical.toString.contains("Repartition 2, false"),
      "rescale down must plan a local coalesce (Repartition shuffle=false)")
    val up = Partitioning.rescale(orders, 4)
    assert(up.rdd.getNumPartitions == 4,
      "rescale up must actually widen parallelism (Flink rescale scales both ways)")
    assert(Partitioning.global(orders).rdd.getNumPartitions == 1)
  }

  test("rescale on a streaming DataFrame plans the exchange instead of throwing") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    // .rdd on a streaming frame throws; rescale must route around it and
    // stay lazy — Flink's rescale is primarily a streaming edge
    val out = Partitioning.rescale(in.toDF(), 4)
    assert(out.isStreaming)
    assert(out.queryExecution.logical.toString.contains("Repartition 4, true"))
  }

  test("broadcastDim plans a broadcast-hash join") {
    val dim = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val p = planOf(Partitioning.broadcastDim(orders, dim, Seq("o_custkey")))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("salting: hot keys fan out over the salt, results equal the unsalted query") {
    val s = spark
    import s.implicits._
    val events = graft.Tables.load(s, sf, "events")
    val salted = Partitioning.saltedAggregate(events, "user_id", "event_id", "value", 8)
    // stage 1 must shuffle on (key, salt) — that IS the skew fix
    assert(planOf(salted).contains("hashpartitioning(user_id") &&
      planOf(salted).contains("__salt"),
      "partial aggregate must hash on (key, salt)")
    val plain = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_rows"),
        sum($"value".cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))
    assert(salted.select("user_id", "n_rows", "total").collect().toSet
      == plain.collect().toSet)

    val o = orders
    val c = graft.Tables.load(s, sf, "customer")
    val j = Partitioning.saltedJoin(o, c, "o_custkey", "c_custkey", "o_orderkey", 8)
    assert(j.count() == o.join(c, o("o_custkey") === c("c_custkey")).count(),
      "salting must not change the join cardinality")
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
