package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The queryable-state POINT LOOKUP (QueryableState.getKvState) — the
  * reference's QueryableStateClient.getKvState analogue: the read must
  * touch a single state partition, not the keyspace, and agree with the
  * set-oriented scan the `queryable_state` gate row exercises. */
class QueryableStateSpec extends SparkSpec {

  test("getKvState reads one state partition and agrees with the full scan") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("qs_point").toString
    val in = MemoryStream[(Long, Long)]
    // snapshot commits, like every state writer whose checkpoint is
    // point-read: fine-grained replay loads a per-version snapshot, which
    // changelog mode only writes via async maintenance
    QueryableState.withSnapshotCommits(s) {
      val q = in.toDS().groupByKey(_._1)
        .mapGroupsWithState[QueryableState.UserAgg, Long](GroupStateTimeout.NoTimeout()) {
          case (key, it, st) =>
            var cur = st.getOption.getOrElse(QueryableState.UserAgg(0L, 0L))
            it.foreach(r => cur = QueryableState.UserAgg(cur.n + 1, cur.sumMicros + r._2))
            st.update(cur)
            key
        }
        .writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", ckpt).start()
      try {
        in.addData((0L until 40L).map(k => (k, k * 10)): _*)
        q.processAllAvailable()
        in.addData((0L until 40L).map(k => (k, 1L)): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

    val lookup = QueryableState.getKvState(s, ckpt, 17L)
    // the point read restricts the scan to the key's ONE state partition
    assert(lookup.rdd.getNumPartitions == 1,
      s"point lookup scanned ${lookup.rdd.getNumPartitions} partitions — not a point read")
    val row = lookup.select(col("key.value"), col("value.groupState.n"),
      col("value.groupState.sumMicros")).collect()
    assert(row.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((17L, 2L, 171L)), s"unexpected state row: ${row.mkString(",")}")

    // agreement with the set-oriented scan (the gate row's read path)
    val full = s.read.format("statestore").option("path", ckpt).load()
    assert(full.rdd.getNumPartitions > 1, "fixture degenerate: full scan has 1 partition")
    val fullRow = full.filter(col("key.value") === 17L)
      .select(col("value.groupState.n"), col("value.groupState.sumMicros")).collect()
    assert(fullRow.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 171L)))

    // every key must be found through its computed partition, not just one
    // lucky hash — the helper's partition arithmetic is what's under test
    (0L until 40L by 7L).foreach { k =>
      val got = QueryableState.getKvState(s, ckpt, k)
        .select(col("value.groupState.sumMicros")).collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(k * 10 + 1),
        s"key $k not found via its computed state partition")
    }

    // the partition count must come from the CHECKPOINT's metadata, not the
    // reading session's conf — a reader with a different setting would
    // compute the wrong partition otherwise
    val before = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "7")
      val got = QueryableState.getKvState(s, ckpt, 23L)
        .select(col("value.groupState.sumMicros")).collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(231L),
        "lookup broke under a mismatched session shuffle-partition conf — " +
          "nParts did not come from the checkpoint metadata")
    } finally s.conf.set("spark.sql.shuffle.partitions", before)
  }
}
