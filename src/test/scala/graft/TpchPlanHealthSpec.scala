package graft

/** Plan health across the whole TPC-H suite: no accidental cartesian
  * products (scalar-subquery broadcasts print as BroadcastNestedLoopJoin
  * with a 1-row side — fine; CartesianProduct with both sides large is the
  * 100 TB killer this guards against). */
class TpchPlanHealthSpec extends SparkSpec {

  test("no TPC-H query plans a CartesianProduct") {
    val offenders = operators.Tpch.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no TPC-DS-shape query plans a CartesianProduct, dims broadcast") {
    val plans = operators.TpcdsShapes.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      name -> df.queryExecution.executedPlan.toString
    }
    val cartesian = plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")
    // the nation/customer dims must ride broadcast joins in the join-heavy shapes
    Seq("dsq_period_deviation", "dsq_rollup_topn", "dsq_customer_profile").foreach { n =>
      assert(plans.toMap.apply(n).contains("BroadcastHashJoin"), s"$n must broadcast dims")
    }
  }
}
