package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bucketing scale contract: a join of two tables co-bucketed on the
  * join key must plan WITHOUT a shuffle on the fact tables — the property
  * that makes a 100 TB fact⋈fact join affordable. */
class BucketingSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** AQE wraps finished subplans in QueryStageExec LEAF nodes (Spark 4 adds
    * ResultQueryStage around the whole plan), so plain collect() never sees
    * inside them — descend through `.plan` explicitly. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    })

  private def shuffles(p: SparkPlan): Int =
    allNodes(p).count(_.isInstanceOf[ShuffleExchangeLike])

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Disable both the static and the AQE runtime broadcast thresholds so the
    * join shape under test is the shuffle-partitioned one. */
  private def withNoBroadcast[A](body: => A): A =
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

  test("bucketed ⋈ bucketed on the bucket key: join itself is shuffle-free") {
    withNoBroadcast {
      Bucketing.ensureBucketed(spark, sf)
      val o = spark.table(Bucketing.ordersTable(sf))
      val l = spark.table(Bucketing.lineitemTable(sf))
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_quantity"))
      val plan = executed(joined)
      assert(shuffles(plan) == 0,
        s"co-bucketed join must not shuffle either side:\n$plan")
      assert(plan.toString.contains("SortMergeJoin"),
        s"expected a sort-merge join over bucketed scans:\n$plan")
      assert(joined.count() > 0)
    }
  }

  test("only one side bucketed: exactly that one side shuffles") {
    withNoBroadcast {
      Bucketing.ensureBucketed(spark, sf)
      val l = spark.table(Bucketing.lineitemTable(sf))
      val o = graft.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val plan = executed(l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_quantity")))
      assert(shuffles(plan) == 1,
        s"non-bucketed side must shuffle into the bucketed partitioning, bucketed side must not:\n$plan")
    }
  }

  test("aggregation keyed on the bucket column needs no shuffle") {
    withNoBroadcast {
      Bucketing.ensureBucketed(spark, sf)
      val l = spark.table(Bucketing.lineitemTable(sf))
      val plan = executed(l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q")))
      assert(shuffles(plan) == 0,
        s"groupBy on the bucket key must aggregate in place:\n$plan")
    }
  }

  test("key-equality scan prunes to a single bucket") {
    // autoBucketedScan drops the bucketed layout when no operator needs the
    // partitioning; pin it on so the filter-only scan keeps bucket pruning
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
    Bucketing.ensureBucketed(spark, sf)
    val l = spark.table(Bucketing.lineitemTable(sf))
    val key = l.select(col("l_orderkey")).head().getLong(0)
    val df = l.filter(col("l_orderkey") === key)
    df.collect()
    val plan = executed(df).toString
    assert(plan.contains("SelectedBucketsCount: 1 out of " + Bucketing.BucketCount),
      s"equality filter on the bucket column must prune to one bucket:\n$plan")
    }
  }

  test("oracle query matches the plain parquet join") {
    val bucketed = Bucketing.colocatedJoin(spark, sf).collect()
    val plain = {
      val o = graft.Tables.load(spark, sf, "orders")
      val l = graft.Tables.load(spark, sf, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority")).collect()
    }
    assert(bucketed.toSeq == plain.toSeq)
  }
}
