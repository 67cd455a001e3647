package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to surface a
  * custom logical operator as a DataFrame — the same doorway Spark
  * extension libraries use. Nothing else in the codebase lives outside
  * the `graft` package. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  /** Unload every loaded state-store provider and stop the maintenance
    * task, closing each provider's RocksDB instance (joining its native
    * background work) while the JVM can still service JNI attach calls.
    * `SparkSession.stop()` alone leaves cached providers loaded; their
    * RocksDB background compactions then race JVM teardown inside
    * rocksdbjni's LoggerJniCallback (SIGSEGV — see BASELINE.md round-11
    * incident note). Call before `spark.stop()` in every main. */
  def stopStateStores(): Unit =
    execution.streaming.state.StateStore.stop()
}
