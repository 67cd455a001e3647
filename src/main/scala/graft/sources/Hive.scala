package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hive catalog + tables — flink-connectors/flink-connector-hive
  * (HiveCatalog.java:136 metastore-backed catalog, HiveTableSource.java
  * partition-pruned scans, HiveTableSink.java dynamic-partition writes,
  * HiveDialect DDL).
  *
  * Spark ships the same surface natively: `enableHiveSupport` binds the
  * session catalog to a metastore (embedded Derby here — offline, pinned
  * under target/ by GraftSession), `STORED AS` DDL creates Hive-format
  * tables, `INSERT OVERWRITE ... PARTITION` writes dynamic partitions,
  * and reads prune partitions from the metastore. The demo round-trips
  * the orders table through a status-partitioned Hive parquet table and
  * re-aggregates from the catalog table; the oracle recomputes from the
  * lake file directly, so a mismatch anywhere in DDL → dynamic-partition
  * write → catalog scan would surface as a value diff.
  *
  * At 100 TB this is the metastore-backed warehouse layout: partition
  * pruning happens against catalog metadata before any file is listed,
  * and dynamic-partition writes parallelize per partition.
  */
object Hive {
  type QFn = (SparkSession, String) => DataFrame

  private def hivePartitionedRoundtrip(s: SparkSession, dir: String): DataFrame = {
    s.sql("SET hive.exec.dynamic.partition.mode=nonstrict")
    s.sql("DROP TABLE IF EXISTS hive_orders")
    s.sql("""CREATE TABLE hive_orders (o_orderkey BIGINT, cents BIGINT)
             PARTITIONED BY (status STRING) STORED AS PARQUET""")
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      .createOrReplaceTempView("hive_src_orders")
    s.sql("""INSERT OVERWRITE TABLE hive_orders PARTITION (status)
             SELECT o_orderkey, cents, status FROM hive_src_orders""")
    s.sql("""SELECT status, count(*) AS n_orders, sum(cents) AS cents_total
             FROM hive_orders GROUP BY status ORDER BY status""")
  }

  def queries: Map[String, QFn] = Map(
    "hive_partitioned_table" -> (hivePartitionedRoundtrip _)
  )

  def oracles: Map[String, String] = Map(
    "hive_partitioned_table" ->
      """SELECT o_orderstatus AS status, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_total
         FROM orders GROUP BY o_orderstatus ORDER BY status"""
  )
}
