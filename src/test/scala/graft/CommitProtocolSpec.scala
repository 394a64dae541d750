package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Write-path partial-failure semantics: the partitioned index write
  * must commit exactly-once under task retry. The shared test session
  * runs local[4] (maxFailures=1 — a task failure kills the job), so
  * the probe runs in its OWN JVM under local[4,3] with an injected
  * first-attempt failure in the write stage (graft.tools.CommitProbe):
  * the retried task's output must be the only committed copy — no row
  * loss from the dead attempt, no duplication from two attempts,
  * pruning intact. Speculation relies on the same attempt-quarantine
  * property of the file committer. */
class CommitProtocolSpec extends AnyFunSuite {
  test("partitioned index write commits exactly-once under injected task retry") {
    val out = java.nio.file.Files.createTempDirectory("graft_commit_probe").toString
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      // carry over the forked test JVM's --add-opens (Spark on JDK 17)
      val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala
        .filter(a => a.startsWith("--add-opens") || a.endsWith("=ALL-UNNAMED"))
      val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx3g",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.CommitProbe", out)
      val p = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
      val log = scala.io.Source.fromInputStream(p.getInputStream).mkString
      val code = p.waitFor()
      assert(code == 0 && log.contains("COMMIT_PROBE_OK"),
        s"probe exit=$code\n${log.takeRight(4000)}")
    } finally Mat.deleteRecursively(out)
  }
}
