package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The exactly-once contract of the streaming file sink: batch reads list
  * files THROUGH the _spark_metadata manifest, so a part file the sink
  * never committed is invisible; and the partition layout prunes. */
class StreamingFileSinkSpec extends SparkSpec {

  test("sink round-trip preserves every source row") {
    StreamingFileSink.writeEvents(spark, sf)
    val sunk = spark.read.parquet(StreamingFileSink.sinkDir(sf)).count()
    val src = graft.Tables.load(spark, sf, "events").count()
    assert(sunk == src)
  }

  test("uncommitted part files are invisible to the manifest read") {
    StreamingFileSink.writeEvents(spark, sf)
    val dir = StreamingFileSink.sinkDir(sf)
    val before = spark.read.parquet(dir).count()
    // forge an orphan: copy a committed part file to an uncommitted name
    // inside an existing partition dir — a crashed trigger's leftovers
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(s"$dir/event_type=*/part-*.parquet")).head.getPath
    val orphan = new Path(part.getParent, "part-99999-orphan.snappy.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    try {
      val after = spark.read.parquet(dir).count()
      assert(after == before,
        "manifest read must not see the uncommitted part file (exactly-once)")
    } finally { fs.delete(orphan, false): Unit }
  }

  test("partition filter prunes to the partition directory") {
    StreamingFileSink.writeEvents(spark, sf)
    val df = spark.read.parquet(StreamingFileSink.sinkDir(sf))
      .filter(col("event_type") === "view")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"event_type must be a partition filter, not a data filter:\n$plan")
  }
}
