package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpec {

  test("poly_hash matches the interpreted HOF formula and DuckDB semantics") {
    val s = spark
    import s.implicits._
    val df = Seq("hello world", "", "a", "The quick brown fox!").toDF("t")
      .withColumn("fast", call_function("poly_hash", col("t")))
      .withColumn("slow", aggregate(
        transform(split(col("t"), ""), ch => ascii(ch).cast("long")),
        lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    // reference value: "a" → 97
    assert(df.filter(col("t") === "a").select("fast").head.getLong(0) == 97L)
  }

  test("dot_f64 matches the sequential fold, bit-exact") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))).toDF("a", "b")
      .withColumn("fast", call_function("dot_f64", col("a"), col("b")))
      .withColumn("slow", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x))
    val r = df.select("fast", "slow").head
    assert(r.getDouble(0) == r.getDouble(1)) // identical fold order → identical bits
  }

  test("expressions run inside whole-stage codegen") {
    val df = graft.Tables.load(spark, sf, "documents")
      .select(call_function("poly_hash", col("text")).as("h"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "poly_hash must not break codegen")
  }
}
