package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ChangelogSpec extends SparkSpec {

  private def row(key: Long, ts: Long, id: Long, value: Double) =
    KeyedRow(key, ts, id, "x", value)

  test("keyedChangelog emits +I then -U/+U retract pairs across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[KeyedRow]
    val q = Changelog.keyedChangelog(in.toDS())
      .writeStream.format("memory").queryName("chg").outputMode("append").start()
    try {
      in.addData(row(1, 10, 1, 1.0))
      q.processAllAvailable()
      in.addData(row(1, 20, 2, 2.0), row(1, 5, 3, 9.9)) // second is stale
      q.processAllAvailable()
      val changes = s.sql("select * from chg").as[Changelog.Change].collect().toList
        .sortBy(c => (c.ts, c.kind))
      assert(changes.map(c => (c.kind, c.id)) ==
        List(("+I", 1L), ("-U", 1L), ("+U", 2L)))
    } finally q.stop()
  }

  test("retractableTopN: a retraction promotes the hidden fourth row into the top-N") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Changelog.Change]
    val q = Changelog.retractableTopN(in.toDS(), 2)
      .writeStream.format("memory").queryName("rtn").outputMode("append").start()
    try {
      // ids 1..3 with values 30,20,10: top-2 = {1,2}; id 3 is hidden
      in.addData(
        Changelog.Change("+I", 7, 1, 1, 30.0),
        Changelog.Change("+I", 7, 2, 2, 20.0),
        Changelog.Change("+I", 7, 3, 3, 10.0))
      q.processAllAvailable()
      // retract the leader ACROSS a micro-batch boundary: id 2 takes rank
      // 1, hidden id 3 surfaces at rank 2 — exactly what the append-only
      // variant cannot do (it discarded everything below rank N)
      in.addData(Changelog.Change("-D", 7, 1, 4, 30.0))
      q.processAllAvailable()
      val log = s.sql("select * from rtn").as[Changelog.RankChange]
        .collect().toList.sortBy(_.seq)
      // first batch emits 2 changes (the 10.0 insert never enters top-2)
      val afterDelete = log.filter(_.seq > 2)
      assert(afterDelete.map(c => (c.kind, c.rnk, c.id)) ==
        List(("-U", 1, 1L), ("+U", 1, 2L), ("-U", 2, 2L), ("+U", 2, 3L)),
        s"promotion log wrong: $afterDelete")
      val folded = Changelog.applyRankChanges(log)
      assert(folded == Map((7L, 1) -> (2L, 20.0), (7L, 2) -> (3L, 10.0)))
    } finally q.stop()
  }

  test("retractableTopN: incremental multi-batch log equals the single-batch log") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val changes = Seq(
      Changelog.Change("+I", 1, 10, 1, 5.0),
      Changelog.Change("+I", 1, 11, 2, 7.0),
      Changelog.Change("-U", 1, 10, 3, 5.0),
      Changelog.Change("+U", 1, 10, 3, 9.0),
      Changelog.Change("+I", 1, 12, 4, 8.0),
      Changelog.Change("-D", 1, 11, 5, 7.0),
      Changelog.Change("+I", 1, 13, 6, 1.0))
    def runSplit(splitAt: Int): List[(String, Int, Long, Double, Long)] = {
      val in = MemoryStream[Changelog.Change]
      val name = s"rtn_split_$splitAt"
      val q = Changelog.retractableTopN(in.toDS(), 2)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        in.addData(changes.take(splitAt): _*)
        q.processAllAvailable()
        in.addData(changes.drop(splitAt): _*)
        q.processAllAvailable()
        s.sql(s"select * from $name").as[Changelog.RankChange].collect().toList
          .sortBy(_.seq).map(c => (c.kind, c.rnk, c.id, c.value, c.seq))
      } finally q.stop()
    }
    val whole = runSplit(changes.size)
    assert(whole.nonEmpty)
    for (split <- Seq(1, 3, 5))
      assert(runSplit(split) == whole,
        s"state must make the emission log split-invariant (split=$split)")
  }

  test("retractableTopN: 50k-change hot key stays sub-quadratic (below-floor churn is O(1))") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Changelog.Change]
    val q = Changelog.retractableTopN(in.toDS(), 3)
      .writeStream.format("memory").queryName("rtn_soak").outputMode("append").start()
    try {
      // 3 leaders, then 50k distinct below-floor rows on the SAME key —
      // the state map grows to 50k entries; a full re-sort per change
      // would be ~10^9 comparisons and time out here
      val leaders = (1L to 3L).map(i => Changelog.Change("+I", 1, i, i, 1e9 + i))
      val churn = (10L until 50010L).map(i => Changelog.Change("+I", 1, i, i, i.toDouble))
      val t0 = System.nanoTime()
      in.addData(leaders ++ churn: _*)
      q.processAllAvailable()
      in.addData(Changelog.Change("-D", 1, 1, 60000, 0.0)) // promote from the 50k pool
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val log = s.sql("select * from rtn_soak").as[Changelog.RankChange]
        .collect().toList.sortBy(_.seq)
      // the delete promotes the best churn row (id 50009) into rank 3
      assert(log.last.kind == "+U" && log.last.rnk == 3 && log.last.id == 50009L)
      assert(log.size <= 11, s"below-floor churn must not emit: ${log.size}")
      assert(secs < 60.0, f"hot-key fold took $secs%.1f s — not sub-quadratic")
    } finally q.stop()
  }

  test("dropUpdateBefore keeps only +I/+U; store merge converges to last rows") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      Changelog.Change("+I", 1, 1, 10, 1.0),
      Changelog.Change("-U", 1, 1, 10, 1.0),
      Changelog.Change("+U", 1, 2, 20, 2.0),
      Changelog.Change("+I", 2, 3, 5, 3.0)).toDS()
    val kept = Changelog.dropUpdateBefore(changes).collect()
    assert(kept.forall(_.kind != "-U") && kept.length == 3)
    // upsert-merge (the foreachBatch sink contract)
    val store = scala.collection.mutable.Map.empty[Long, Changelog.Change]
    Changelog.applyToStore(store, kept.toSeq.sortBy(_.ts))
    assert(store(1L).id == 2 && store(2L).id == 3)
  }

  test("foreachBatch upsert sink materializes the latest row per key") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val store = scala.collection.concurrent.TrieMap.empty[Long, Changelog.Change]
    val in = MemoryStream[KeyedRow]
    val q = Changelog.keyedChangelog(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Changelog.Change], _: Long) =>
        val rows = batch.collect().sortBy(c => (c.ts, c.id))
        rows.foreach { c =>
          c.kind match {
            case "+I" | "+U" => store(c.key) = c
            case "-D" => store.remove(c.key)
            case _ =>
          }
        }
      }.start()
    try {
      in.addData(row(1, 10, 1, 1.0), row(2, 10, 2, 5.0))
      q.processAllAvailable()
      in.addData(row(1, 30, 3, 3.0))
      q.processAllAvailable()
      assert(store(1L).value == 3.0 && store(2L).value == 5.0)
    } finally q.stop()
  }

  test("e2e: unbounded join changelog through a foreachBatch upsert equals the batch join") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // upsert table keyed on the join's output identity (key, left_id,
    // right_id) — the reference's upsert-kafka/StreamExecSink contract:
    // +I/+U put, -U retracts the null-padded row it corrects
    val store = scala.collection.concurrent.TrieMap
      .empty[(Long, Long, Option[Long]), (Double, Option[Double])]
    val lIn = MemoryStream[KeyedRow]
    val rIn = MemoryStream[KeyedRow]
    val q = StatefulOps
      .unboundedLeftOuterJoinWithTtl(lIn.toDS(), rIn.toDS(), java.time.Duration.ofMinutes(10))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[JoinEmit], _: Long) =>
        batch.collect().foreach { e =>
          e.op match {
            case "+I" | "+U" => store((e.key, e.left_id, e.right_id)) = (e.left_value, e.right_value)
            case "-U" => store.remove((e.key, e.left_id, e.right_id))
            case _ =>
          }
        }
      }.start()
    // ProcessingTimeTimeout keeps scheduling batches → processAllAvailable
    // never quiesces; poll the upsert table instead
    def awaitStore(n: Int, what: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (store.size != n) {
        if (q.exception.isDefined) throw q.exception.get
        assert(System.nanoTime() < deadline, s"timed out waiting for $what; store=$store")
        Thread.sleep(100)
      }
    }
    try {
      in(lIn, row(1, 1, 101, 10.0)); awaitStore(1, "+I pad for 101") // unmatched → +I pad
      in(rIn, row(1, 2, 901, 1.0)); awaitStore(1, "pad retracted, (101,901) upserted")
      in(lIn, row(1, 5, 102, 20.0), row(2, 1, 201, 30.0)); awaitStore(3, "102 joined, 201 padded")
      in(rIn, row(1, 9, 902, 2.0)); awaitStore(5, "902 joined to 101 and 102")
      // final upserted state == the batch left-outer join of everything seen
      val left = Seq((1L, 101L, 10.0), (1L, 102L, 20.0), (2L, 201L, 30.0))
        .toDF("key", "left_id", "left_value")
      val right = Seq((1L, 901L, 1.0), (1L, 902L, 2.0))
        .toDF("key", "right_id", "right_value")
      val expected = left.join(right, Seq("key"), "left_outer").collect().map { r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getLong(3))) ->
          (r.getDouble(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.toMap
      assert(store.toMap == expected)
    } finally q.stop()
  }

  private def in(ms: MemoryStream[KeyedRow], rows: KeyedRow*): Unit = ms.addData(rows)
}
