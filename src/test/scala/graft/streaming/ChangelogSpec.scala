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
}
