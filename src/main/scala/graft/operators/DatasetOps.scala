package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset transformations — the reference's DataStream/DataSet
  * functional surface (DataStream.java:591,636,735 map/flatMap/filter;
  * DataSet.java:237 mapPartition; KeyedStream.java keyBy+reduce) on
  * Spark's `Dataset[T]` with case-class Encoders.
  *
  * These intentionally run Scala lambdas (the reference's user-function
  * model). For hot paths the relational modules show the codegen'd
  * equivalents; at 100 TB you'd prefer those, but the typed API must exist
  * for parity with user-defined logic. Each lambda is a pure per-row
  * function, so the operators stay embarrassingly parallel — no driver-side
  * collect anywhere.
  */
object DatasetOps {
  type QFn = (SparkSession, String) => DataFrame

  final case class Event(event_id: Long, user_id: Long, event_type: String,
                         value: Double)
  final case class Doc(doc_id: Long, text: String, lang: String)

  private def events(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }

  /** DataStream.map — per-record transform. */
  private def dsMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .map(e => (e.event_id, e.event_type.toUpperCase, e.value * 2))
      .toDF("event_id", "type_upper", "value2")
      .orderBy(col("event_id"))
  }

  /** DataStream.flatMap — 0..n records out per record in. */
  private def dsFlatMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).as[Doc]
      .flatMap(d => d.text.trim.split(" ").map(t => (d.doc_id, t)))
      .toDF("doc_id", "token")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("token"))
  }

  /** DataStream.filter — typed predicate. */
  private def dsFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .filter(e => e.event_type == "purchase" && e.value > 100.0)
      .map(e => (e.event_id, e.user_id))
      .toDF("event_id", "user_id")
      .orderBy(col("event_id"))
  }

  /** DataSet.mapPartition — per-partition imperative pass (the reference's
    * escape hatch; ours too, with the same caveat: use relational ops when
    * the logic is expressible). */
  private def dsMapPartitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .mapPartitions(it => it.map(e => (e.event_id, e.value.floor.toLong)))
      .toDF("event_id", "value_floor")
      .orderBy(col("event_id"))
  }

  /** KeyedStream.reduce / groupByKey + reduceGroups. */
  private def dsReduce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupByKey(_.user_id)
      .mapValues(_.event_id)
      .reduceGroups((a, b) => math.max(a, b))
      .toDF("user_id", "max_event_id")
      .orderBy(col("user_id"))
  }

  /** DataSet.coGroup (DataSet.java:1056) — full outer per-key group pairing. */
  private def dsCoGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).groupByKey(_.user_id)
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .as[(Long, Double)].groupByKey(_._1)
    ev.cogroup(cust) { (key, es, cs) =>
      val nE = es.size
      val nC = cs.size
      Iterator.single((key, nE.toLong, nC.toLong))
    }.toDF("user_id", "n_events", "n_cust")
      .filter(col("n_events") > 0)
      .orderBy(col("user_id"))
  }

  def queries: Map[String, QFn] = Map(
    "ds_map" -> (dsMap _),
    "ds_flatmap" -> (dsFlatMap _),
    "ds_filter" -> (dsFilter _),
    "ds_mappartitions" -> (dsMapPartitions _),
    "ds_reduce" -> (dsReduce _),
    "ds_cogroup" -> (dsCoGroup _)
  )

  def oracles: Map[String, String] = Map(
    "ds_map" ->
      """SELECT event_id, upper(event_type) AS type_upper, value * 2 AS value2
         FROM events ORDER BY event_id""",
    "ds_flatmap" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents)
         GROUP BY token ORDER BY token""",
    "ds_filter" ->
      """SELECT event_id, user_id FROM events
         WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id""",
    "ds_mappartitions" ->
      """SELECT event_id, CAST(floor(value) AS BIGINT) AS value_floor
         FROM events ORDER BY event_id""",
    "ds_reduce" ->
      """SELECT user_id, max(event_id) AS max_event_id
         FROM events GROUP BY user_id ORDER BY user_id""",
    "ds_cogroup" ->
      """SELECT e.user_id, e.n_events,
                coalesce(c.n_cust, 0) AS n_cust
         FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
         LEFT JOIN (SELECT c_custkey, count(*) AS n_cust FROM customer GROUP BY c_custkey) c
           ON e.user_id = c.c_custkey
         ORDER BY e.user_id"""
  )
}
