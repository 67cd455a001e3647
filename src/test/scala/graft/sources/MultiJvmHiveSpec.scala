package graft.sources

import java.io.File

import scala.sys.process._

import graft.SparkSpec

/** Reproduces the round-9 driver-gate failure shape: a SECOND hive-enabled
  * JVM booting its catalog while the first JVM's session is alive and has
  * its metastore booted. With the shared on-disk Derby metastore this died
  * with Derby XSDB6 in the second JVM; with the per-JVM in-memory metastore
  * (GraftSession.metastoreName) both JVMs must run the catalog-routed
  * queries (Hive dynamic-partition round-trip + bucketed saveAsTable)
  * concurrently without interference.
  */
class MultiJvmHiveSpec extends SparkSpec {

  test("second hive-enabled JVM boots and runs catalog queries while this one is live") {
    // 1. Boot THIS JVM's metastore and exercise both catalog paths, keeping
    //    the session (and thus the booted metastore) alive across the fork.
    assert(Hive.queries("hive_partitioned_table")(spark, sf).count() > 0)
    assert(Bucketing.queries("bucket_colocated_join")(spark, sf).count() > 0)

    // 2. Fork a second JVM running the same two queries via HiveProbe.
    val java = new File(new File(sys.props("java.home"), "bin"), "java").getPath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.HiveProbe", sf)
    val out = new StringBuilder
    val code = Process(cmd, new File(".")) ! ProcessLogger(
      l => out.synchronized { out.append(l).append('\n'); () },
      l => out.synchronized { out.append(l).append('\n'); () })
    val text = out.toString
    assert(code == 0, s"probe JVM exited $code:\n${text.takeRight(4000)}")
    assert(text.contains("HIVE_PROBE_OK hive_partitioned_table"),
      s"missing hive marker:\n${text.takeRight(2000)}")
    assert(text.contains("HIVE_PROBE_OK bucket_colocated_join"),
      s"missing bucket marker:\n${text.takeRight(2000)}")
    assert(!text.contains("XSDB6"), "Derby cross-JVM lock resurfaced")

    // 3. The first JVM's catalog must still be healthy after the fork.
    assert(Hive.queries("hive_partitioned_table")(spark, sf).count() > 0)
  }
}
