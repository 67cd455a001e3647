package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PruneAsOfJoinSpec extends SparkSpec {

  test("projection is pushed into both AsOfJoin children, keys/times kept") {
    val s = spark
    import s.implicits._
    // wide sides: only 1 payload column of each is referenced downstream
    val left = Seq((1L, 10L, "a", "lwaste1", "lwaste2"))
      .toDF("k", "t", "lpay", "lw1", "lw2")
    val right = Seq((1L, 5L, "x", "rwaste1", "rwaste2"))
      .toDF("rk", "rt", "rpay", "rw1", "rw2")
    val out = AsOf.join(left, right, left("k"), right("rk"), left("t"), right("rt"))
      .select($"lpay", $"rpay")
    val optimized = out.queryExecution.optimizedPlan
    val aj = optimized.collectFirst { case a: AsOfJoin => a }.get
    val childCols = (aj.left.output ++ aj.right.output).map(_.name).toSet
    assert(!childCols.exists(_.startsWith("lw")) && !childCols.exists(_.startsWith("rw")),
      s"waste columns not pruned: $childCols")
    assert(Set("k", "t", "rk", "rt").subsetOf(childCols), "join keys/times must survive")
    // and the result is still correct
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "x")))
  }
}
