package graft.streaming

import java.io.File

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 incident path (BASELINE.md round-11 note): one
  * `StateScaleProbe cep,nav 10000000` run died with SIGSEGV in rocksdbjni's
  * `LoggerJniCallback::Logv` — a native background-compaction thread logging
  * through the JNI bridge while the JVM was past the point of servicing
  * attach calls. The mitigation is twofold (GraftSession): the RocksDB
  * state-store logger runs at ERROR so routine flush/compaction chatter
  * never crosses the JNI bridge, and every main ends with
  * `GraftSession.shutdown` — StateStore.stop() closes all cached RocksDB
  * providers (joining their native background work) BEFORE the session and
  * JVM tear down.
  *
  * This spec forks a REAL second JVM through the exact shape that crashed —
  * RocksDB-backed streaming state driven deep enough to force flushes and
  * background compactions, then process exit — and asserts a clean exit
  * code (a SIGSEGV exits 134/139, never 0).
  */
class RocksDbShutdownSpec extends AnyFunSuite {

  test("a forked JVM driving RocksDB state to depth exits cleanly (no JNI-logger crash)") {
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
    // 300k CEP keys: enough state to force RocksDB flushes + background
    // compactions (the crash's trigger population) while keeping the spec
    // in the MultiJvmHiveSpec cost class
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx6g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.StateScaleProbe", "cep", "300000")
    val startedAt = System.currentTimeMillis()
    val out = new StringBuilder
    val code = Process(cmd, new File(".")) ! ProcessLogger(
      l => out.synchronized { out.append(l).append('\n'); () },
      l => out.synchronized { out.append(l).append('\n'); () })
    val text = out.toString
    assert(code == 0,
      s"probe JVM exited $code (SIGSEGV exits 134/139):\n${text.takeRight(4000)}")
    assert(text.contains("\"probe\":\"cep_match_stream\""),
      s"probe did not reach its output line:\n${text.takeRight(2000)}")
    assert(!new File(".").listFiles.exists(f =>
        f.getName.startsWith("hs_err_pid") && f.lastModified() >= startedAt),
      "probe JVM left an hs_err crash dump in the repo root")
  }

  test("an ABNORMAL exit (System.exit with open providers) is caught by the shutdown hook") {
    // the round-11 reproduction: a disk-full task abort exited through a
    // path that skips finally blocks, leaving RocksDB providers open into
    // JVM teardown — SIGSEGV in the JNI logger callback (exit 134). The
    // once-per-JVM shutdown hook (GraftSession.installShutdownHook) closes
    // the providers during the hooks phase, while JNI attach still
    // succeeds; this fork exits 3 by design and must NEVER crash.
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
      "-Xmx6g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.AbruptExitProbe", "200000")
    val startedAt = System.currentTimeMillis()
    val out = new StringBuilder
    val code = Process(cmd, new File(".")) ! ProcessLogger(
      l => out.synchronized { out.append(l).append('\n'); () },
      l => out.synchronized { out.append(l).append('\n'); () })
    val text = out.toString
    assert(text.contains("ABRUPT_PROBE_STATE_BUILT"),
      s"probe never built its state:\n${text.takeRight(2000)}")
    assert(code == 3,
      s"abnormal-exit probe must exit 3 (its own code), got $code " +
        s"(SIGSEGV/SIGABRT exit 134/139):\n${text.takeRight(4000)}")
    assert(!new File(".").listFiles.exists(f =>
        f.getName.startsWith("hs_err_pid") && f.lastModified() >= startedAt),
      "abnormal-exit probe left an hs_err crash dump")
  }
}
