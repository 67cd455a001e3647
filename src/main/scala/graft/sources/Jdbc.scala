package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** JDBC connector — flink-connectors/flink-connector-jdbc
  * (table/JdbcDynamicTableSource.java scan + predicate-era lookup,
  * table/JdbcDynamicTableSink.java buffered upsert writes,
  * dialect/DerbyDialect.java): relational-database tables as sources and
  * sinks.
  *
  * Spark's native JDBC source/sink covers the surface: `write.jdbc`
  * creates-and-loads the table, `read.jdbc` scans with predicate and
  * projection pushdown into the database's SQL. The demo runs against an
  * EMBEDDED Derby instance — in-process and offline, the exact engine the
  * reference's own JDBC dialect list and ITCases use (DerbyDialect.java,
  * DerbyDbMetadata.java) — so the row is executable here, unlike the
  * network-service connectors (HBase/ES) whose jars are unobtainable in
  * this sandbox.
  *
  * At scale the dim table lives in the RDBMS and the fact scan stays on
  * the lake: exactly this plan — the JDBC side is a bounded dimension
  * read (optionally partitioned by `partitionColumn` for parallel
  * extraction), broadcast onto the fact.
  */
object Jdbc {
  type QFn = (SparkSession, String) => DataFrame

  /** Derby uppercases unquoted identifiers; fold the read-back schema to
    * the lake's lowercase convention. */
  private def lowered(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  private def jdbcDimJoin(s: SparkSession, dir: String): DataFrame = {
    val token = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val url = s"jdbc:derby:target/derby/dim_$token;create=true"
    // sink: publish the dimension into the database
    Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "nation").save()
    // source: scan it back — the filter pushes into Derby's SQL
    val dim = lowered(s.read.format("jdbc")
        .option("url", url).option("dbtable", "nation").load())
      .filter(col("n_regionkey") < 3)
    // the deployment plan: bounded JDBC dim broadcast onto the lake fact
    Tables.load(s, dir, "customer")
      .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_nationkey"))
  }

  def queries: Map[String, QFn] = Map(
    "jdbc_dim_join" -> (jdbcDimJoin _)
  )

  def oracles: Map[String, String] = Map(
    "jdbc_dim_join" ->
      """SELECT n_nationkey, n_name, count(*) AS n_customers
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         WHERE n_regionkey < 3
         GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""
  )
}
