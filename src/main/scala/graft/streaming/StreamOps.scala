package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative Structured-Streaming transforms covering the reference's
  * group-window and stream-join surface (SURVEY.md §2.5, §2.3) where Spark
  * is natively sufficient — these are deliberately thin: the value is the
  * mapping, the execution is stock Catalyst + the streaming state store.
  *
  * Reference semantics covered:
  *  - TUMBLE/HOP window aggs  → `window(ts, width[, slide])`
  *    (StreamExecGroupWindowAggregate.scala:33 / WindowOperator.java:98)
  *  - SESSION window aggs     → `session_window(ts, gap)`
  *    (assigners/SessionWindowAssigner)
  *  - watermarks              → `withWatermark` = bounded out-of-orderness
  *    (WatermarkStrategy.forBoundedOutOfOrderness); allowed lateness ≈ a
  *    wider delay (WindowOperator.java:136-139)
  *  - interval join           → stream-stream join with a time-range
  *    predicate (TimeIntervalJoin.java:479)
  *  - dedup first-row per key → dropDuplicatesWithinWatermark
  *    (ProcTimeDeduplicateKeepFirstRowFunction)
  *  - unbounded group agg     → groupBy().agg() in Update output mode
  *    (GroupAggFunction.java:45; Spark keeps accumulators in the state store)
  */
object StreamOps {

  /** Bounded-out-of-orderness watermark on `tsCol`. */
  def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Watermark idleness (WatermarkStrategy.withIdleness, reference
    * WatermarksWithIdleness.java): in the reference an idle source partition
    * is excluded from the min-watermark so it can't stall every downstream
    * event-time operator. Spark's global watermark is per-QUERY, min over
    * the query's watermarked STREAMS — so the stall shows up when a
    * multi-stream query (union/join) has one idle input. The mapped control
    * is the multiple-watermark policy: "max" lets the active stream drive
    * progress (≈ declaring idle inputs ignorable), "min" (default) is the
    * stall-prone strict behavior. Set BEFORE starting the query. */
  def setWatermarkIdlenessPolicy(spark: org.apache.spark.sql.SparkSession,
                                 advanceOnIdle: Boolean): Unit =
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy",
      if (advanceOnIdle) "max" else "min")

  /** Tumbling event-time window aggregation. */
  def tumbleAgg(df: DataFrame, tsCol: String, width: String,
                keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .withColumn("w_end", col("window.end"))
      .drop("window")

  /** Hopping (sliding) event-time window aggregation. */
  def hopAgg(df: DataFrame, tsCol: String, width: String, slide: String,
             keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with a static gap. Dynamic-gap sessions
    * (DynamicEventTimeSessionWindows) need a custom stateful op — gap noted
    * in SURVEY §2.5. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Interval join: `l.ts BETWEEN r.ts - lower AND r.ts + upper` plus an
    * equi-key — native stream-stream join once both sides carry watermarks
    * (KeyedStream.intervalJoin / between, KeyedStream.java:423,488). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: (Column, Column),
                   lts: Column, rts: Column, lower: String, upper: String): DataFrame =
    left.join(right,
      key._1 === key._2 &&
        lts >= rts - expr(s"INTERVAL $lower") &&
        lts <= rts + expr(s"INTERVAL $upper"))

  /** Keep-first-row dedup that can drop state once the watermark passes —
    * the streaming analogue of ROW_NUMBER()=1 dedup
    * (StreamExecDeduplicateRule.scala:114). */
  def dedupFirstWithinWatermark(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keys)

  /** Unbounded keyed aggregation; pair with Update output mode at the sink —
    * the retract-stream (`-U/+U`) behavior surfaces as per-key re-emission. */
  def updateAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
}
