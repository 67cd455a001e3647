package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("custom strategy plans AsOfJoinExec with co-partitioned sorted inputs") {
    val df = AsOf.qAsofCustom(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom exec missing from:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), "key co-partitioning expected")
    assert(plan.contains("Sort ["), "per-partition (key,time) sort expected")
  }

  test("merge result matches the compositional ROW_NUMBER=1 formulation") {
    val s = spark
    import s.implicits._
    // hand fixture with repeated keys, ties, and a no-version left row
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 15L, 901L), (1L, 20L, 902L), (2L, 9L, 903L))
      .toDF("rk", "rt", "rid")
    val out = AsOf.join(left, right, left("k"), right("rk"), left("t"), right("rt"))
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      100L -> 900L, // t=10: latest version ≤ 10 is rt=5
      101L -> 902L, // t=20: rt=20 included (non-strict)
      102L -> -1L,  // k=2 t=5: no version ≤ 5
      103L -> -1L)) // k=3: no versions at all
    // strict variant excludes the rt=20 tie
    val strictOut = AsOf.join(left, right, left("k"), right("rk"), left("t"), right("rt"),
        strict = true)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(strictOut(101L) == 901L)
  }

  test("custom operator agrees with the window formulation on real data") {
    val custom = AsOf.qAsofCustom(spark, sf).collect().map(_.toString).sorted
    val composed = graft.operators.TimeOps.queries("time_asof_join")(spark, sf)
      .collect().map(_.toString).sorted
    assert(custom.toSeq == composed.toSeq)
  }
}
