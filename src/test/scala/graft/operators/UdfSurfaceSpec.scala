package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.SparkException

class UdfSurfaceSpec extends SparkSpec {

  test("SINGLE_VALUE fails on a group with more than one distinct value") {
    val s = spark
    import s.implicits._
    val sv = udaf(new UdfSurface.SingleValue)
    val df = Seq((1, "a"), (1, "b")).toDF("k", "v")
      .groupBy($"k").agg(sv($"v"))
    val e = intercept[SparkException] { df.collect() }
    assert(e.getMessage.contains("SINGLE_VALUE") ||
      Option(e.getCause).exists(_.getMessage.contains("more than one value")))
  }

  test("COLLECT multiset counts duplicates per group, canonical order") {
    val s = spark
    import s.implicits._
    val cm = udaf(new UdfSurface.CollectMultiset)
    val out = Seq((1, "x"), (1, "y"), (1, "x"), (2, "z")).toDF("k", "v")
      .groupBy($"k").agg(cm($"v").as("ms"))
      .orderBy($"k").collect().map(_.getString(1)).toSeq
    assert(out == Seq("x:2,y:1", "z:1"))
  }
}
