package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every operator family from
  * SURVEY.md §2 contributes entries here; names are stable across rounds.
  */
object SparkEntry {
  type QFn = (SparkSession, String) => DataFrame

  private def modules: Seq[(Map[String, QFn], Map[String, String])] = Seq(
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Tpch.queries, operators.Tpch.oracles),
    (operators.TpcdsShapes.queries, operators.TpcdsShapes.oracles),
    (operators.Tpcds.queries, operators.Tpcds.oracles),
    (operators.Joins.queries, operators.Joins.oracles),
    (operators.Aggregations.queries, operators.Aggregations.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.SetOps.queries, operators.SetOps.oracles),
    (operators.FuncQueries.queries, operators.FuncQueries.oracles),
    (operators.DatasetOps.queries, operators.DatasetOps.oracles),
    (operators.TimeOps.queries, operators.TimeOps.oracles),
    (operators.UdfSurface.queries, operators.UdfSurface.oracles),
    (operators.LookupJoin.queries, operators.LookupJoin.oracles),
    (operators.Partitioning.queries, operators.Partitioning.oracles),
    (sources.Formats.queries, sources.Formats.oracles),
    (sources.Bucketing.queries, sources.Bucketing.oracles),
    (sources.StreamingFileSink.queries, sources.StreamingFileSink.oracles),
    (sources.ZOrder.queries, sources.ZOrder.oracles),
    (sources.Jdbc.queries, sources.Jdbc.oracles),
    (sources.Hive.queries, sources.Hive.oracles),
    (functions.Sketches.queries, functions.Sketches.oracles),
    (plans.AsOf.queries, plans.AsOf.oracles),
    (sql.FlinkSqlQueries.queries, sql.FlinkSqlQueries.oracles),
    (graph.Graphs.queries, graph.Graphs.oracles),
    (streaming.StatefulOps.queries, streaming.StatefulOps.oracles),
    (streaming.QueryableState.queries, streaming.QueryableState.oracles),
    (streaming.Iterations.queries, streaming.Iterations.oracles),
    (streaming.Triggers.queries, streaming.Triggers.oracles),
    (streaming.Cep.queries, streaming.Cep.oracles),
    (pipeline.Dedup.queries, pipeline.Dedup.oracles),
    (pipeline.TextAnalysis.queries, pipeline.TextAnalysis.oracles),
    (pipeline.Similarity.queries, pipeline.Similarity.oracles),
    (pipeline.CorpusOps.queries, pipeline.CorpusOps.oracles),
    (pipeline.Multimodal.queries, pipeline.Multimodal.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, QFn] = modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.iterator.map(_._2).reduce(_ ++ _)
}
