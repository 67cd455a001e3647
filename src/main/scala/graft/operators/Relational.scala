package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-H-style relational queries: scan → filter → aggregate → sort pipelines.
  *
  * Mirrors the reference's batch SQL surface (Blink planner BatchExecCalc /
  * BatchExecHashAggregate / BatchExecHashJoin / BatchExecSortLimit — see
  * flink-table-planner-blink nodes/physical/batch/) exercised by its TPC-H
  * e2e suite (flink-end-to-end-tests/flink-tpch-test, test_tpch.sh:22).
  *
  * Spark-first: every query is a declarative DataFrame plan, so Catalyst does
  * predicate pushdown into the parquet scan, column pruning, partial (map-side)
  * aggregation, and broadcast-join selection automatically — verified via
  * .explain in the specs. Money arithmetic goes through DECIMAL(18,2) so
  * results are bit-exact and order-independent (safe under any shuffle
  * schedule at any scale), then surfaces as DOUBLE for a stable schema.
  */
object Relational {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact money type: sums of DECIMAL are order-independent, unlike DOUBLE. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def d(c: Column): Column = c.cast("double")

  /** TPC-H Q1: pricing summary report.
    * Plan shape: parquet scan (filter pushed) → partial hash agg → shuffle on
    * (returnflag, linestatus) → final hash agg → sort. 6 groups at any SF, so
    * the shuffle moves only partial aggregates — scales linearly in input. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        d(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))).as("sum_disc_price"),
        d(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))) * (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax"))))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (d(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (d(sum(dec(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  def queries: Map[String, QFn] = Map(
    "q1_agg" -> (q1 _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle
  )
}
