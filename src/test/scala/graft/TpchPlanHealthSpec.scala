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
}
