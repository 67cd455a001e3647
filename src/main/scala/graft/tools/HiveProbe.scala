package graft.tools

/** Second-JVM Hive/metastore probe — the exact shape that broke round 9.
  *
  * Embedded Derby allows ONE booting JVM per database; the round-9 shared
  * `target/metastore_db` meant any resident JVM (the driver's sbt bench)
  * locked every other JVM out of catalog boot (Derby XSDB6 → "Unable to
  * instantiate SessionHiveMetaStoreClient"), failing the Hive AND bucketed
  * rows at the driver gate. GraftSession now boots a per-JVM in-memory
  * metastore; this main is forked from MultiJvmHiveSpec WHILE the test
  * JVM's own hive-enabled session is alive, and must complete both
  * catalog-routed queries (Hive dynamic-partition round-trip and bucketed
  * `saveAsTable`) to prove the cross-JVM lock is gone.
  *
  * Prints one machine-checkable line per query: `HIVE_PROBE_OK <name> <rows>`.
  */
object HiveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Seq(
      "hive_partitioned_table" -> graft.sources.Hive.queries("hive_partitioned_table"),
      "bucket_colocated_join" -> graft.sources.Bucketing.queries("bucket_colocated_join")
    ).foreach { case (name, fn) =>
      val n = fn(s, dir).count()
      println(s"HIVE_PROBE_OK $name $n")
    }
    s.stop()
  }
}
