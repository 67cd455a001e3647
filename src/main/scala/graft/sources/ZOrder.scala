package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton-curve) clustering — the multi-dimensional data-layout
  * counterpart to [[Bucketing]]: interleave the bits of two scan dimensions
  * into one sort key so a range-partitioned write co-locates rows that are
  * close in BOTH dimensions. Parquet min/max footers on z-sorted files then
  * prune scans filtered on either dimension (the Delta/Iceberg OPTIMIZE
  * ZORDER mechanism, built from plain expressions).
  *
  * Scale: the z-value is a pure 16-bit×2 bit-interleave projection
  * (codegen'd integer ops, no UDF); clustering is one range-partitioned
  * sort — exactly the shuffle a sorted write already pays. Nothing here is
  * driver-side; ZOrderSpec measures the locality the layout buys.
  */
object ZOrder {
  type QFn = (SparkSession, String) => DataFrame

  private val Bits = 16

  /** Morton interleave of the low 16 bits of x (even positions) and y (odd
    * positions): sum over disjoint bit positions, identical arithmetic in
    * any engine with 64-bit ints. */
  def zvalue(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  /** Orders clustered on z(custkey, order-day): the layout that serves both
    * per-customer and per-date-range scans from the same files. */
  private def zorderOrders(s: SparkSession, dir: String): DataFrame = {
    val x = (col("o_custkey") % 65536).cast("long")
    val y = (datediff(col("o_orderdate"), lit("1992-01-01")) % 65536).cast("long")
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), x.as("x"), y.as("y"))
      .withColumn("zval", zvalue(col("x"), col("y")))
      .orderBy(col("zval"), col("o_orderkey"))
  }

  def queries: Map[String, QFn] = Map(
    "zorder_cluster" -> (zorderOrders _)
  )

  def oracles: Map[String, String] = Map(
    "zorder_cluster" ->
      s"""WITH t AS (SELECT o_orderkey,
                   CAST(o_custkey % 65536 AS BIGINT) AS x,
                   CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 65536 AS BIGINT) AS y
                 FROM orders)
          SELECT o_orderkey, x, y,
                 CAST(list_sum(list_transform(range(0, $Bits),
                   i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zval
          FROM t ORDER BY zval, o_orderkey"""
  )
}
