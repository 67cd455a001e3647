package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming iterations — `DataStream.iterate()` / `closeWith()`
  * (flink-streaming-java/.../datastream/DataStream.java:537,
  * IterativeStream.java): a feedback edge whose elements re-enter the
  * iteration head, running until the loop quiesces.
  *
  * Spark's streaming DAG has no feedback edge; the native shape is a
  * feedback CHANNEL: one StreamingQuery whose file source is ALSO its own
  * foreachBatch output directory. Label proposals stream in; keyed state
  * holds each vertex's current minimum label and emits only strict
  * IMPROVEMENTS; the batch handler expands improvements to the vertex's
  * neighbors and appends them back into the channel — `closeWith`. A
  * single `processAllAvailable()` then drives the loop to the fixpoint:
  * feedback files count as "available data", so the call returns exactly
  * when a round produces no feedback (the reference's maxWaitTime
  * termination, made exact). Labels strictly decrease and are bounded
  * below, so termination is guaranteed; rounds ≈ graph diameter, the same
  * superstep count as the batch Pregel in `graph/Graphs.scala`.
  *
  * The converged component labels are then read FROM THE ITERATION'S OWN
  * KEYED STATE via the `statestore` source ([[QueryableState]]'s
  * mechanism) — no separate result sink needed. The oracle is
  * `graph_connected_components`'s recursive CTE verbatim: a streaming
  * feedback loop and a batch Pregel must converge to the same fixpoint.
  *
  * Scale shape: per round, feedback volume = improvements × out-degree —
  * identical to the batch Pregel's message volume — and the expansion
  * join runs against the shared hash-partitioned edge cache. State is one
  * long per vertex.
  */
object Iterations {
  type QFn = (SparkSession, String) => DataFrame

  private[streaming] case class Label(node: Long, label: Long)
  private[streaming] case class MinLabel(label: Long)

  def qStreamIterateComponents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val token = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val chan = graft.RelayDir.fresh("iterate_chan", token)
    val ckpt = s"$chan.ckpt"
    val edges = graft.graph.Graphs.edges(s, dir) // (src, dst), both directions
    // seed generation: every vertex proposes its own id into the channel
    edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .write.mode("append").parquet(chan)

    val schema = org.apache.spark.sql.Encoders.product[Label].schema
    val proposals = s.readStream.schema(schema).parquet(chan).as[Label]
    // iteration head: min-label state, emit strict improvements only
    val improved = proposals.groupByKey(_.node)
      .flatMapGroupsWithState[MinLabel, Label](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (node, it, st) =>
          val cur = st.getOption.map(_.label).getOrElse(Long.MaxValue)
          val m = it.map(_.label).min
          if (m < cur) { st.update(MinLabel(m)); Iterator(Label(node, m)) }
          else Iterator.empty
      }
    val q = improved.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Label], _: Long) =>
        // closeWith: improvements propagate to neighbors and re-enter the
        // head through the channel; an empty round writes nothing, which
        // terminates processAllAvailable. The min-combiner collapses the
        // edge-expanded messages to ONE proposal per destination before
        // they hit the channel — the written feedback is O(vertices), not
        // O(edges), per round (the batch Pregel's pre-aggregation)
        // persist+count once: the old `isEmpty` probe followed by `write`
        // executed the expansion join TWICE per round (r16; the loop pays
        // this every superstep, so it halved the per-round batch work)
        val fb = batch.toDF().join(edges, col("node") === col("src"))
          .groupBy(col("dst").as("node"))
          .agg(min(col("label")).as("label"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try { if (fb.count() > 0) fb.write.mode("append").parquet(chan) }
        finally fb.unpersist(blocking = false)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // converged result = the iteration's keyed state, read externally
    s.read.format("statestore").option("path", ckpt).load()
      .select(col("key.value").as("node"),
        col("value.groupState.label").as("component"))
      .orderBy("node")
  }

  def queries: Map[String, QFn] = Map(
    "stream_iterate_components" -> (qStreamIterateComponents _)
  )

  def oracles: Map[String, String] = Map(
    // a streaming feedback loop and the batch Pregel share one fixpoint
    "stream_iterate_components" ->
      graft.graph.Graphs.oracles("graph_connected_components")
  )
}
