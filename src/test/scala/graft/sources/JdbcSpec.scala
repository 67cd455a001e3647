package graft.sources

import graft.SparkSpec

/** The JDBC parallel-extraction claim, executed: the partitionColumn range
  * scan must actually fan out into [[Jdbc.ParallelPartitions]] concurrent
  * range queries (JdbcDynamicTableSource's scan.partition.* options), and
  * the partitioned read-back must equal the published slice. */
class JdbcSpec extends SparkSpec {

  test("partitionColumn read fans out into N>1 JDBC range partitions") {
    val scan = Jdbc.parallelOrdersScan(spark, sf)
    assert(scan.rdd.getNumPartitions == Jdbc.ParallelPartitions,
      s"expected ${Jdbc.ParallelPartitions} range partitions, " +
        s"got ${scan.rdd.getNumPartitions}")
    // range splits must neither drop nor duplicate rows
    val expected = graft.Tables.load(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 10 === 0).count()
    assert(scan.count() == expected)
    assert(scan.select("o_orderkey").distinct().count() == expected)
  }

  test("the parallel-read aggregate matches the oracle semantics") {
    val rows = Jdbc.queries("jdbc_parallel_read")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }
}
