package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[HiveSyncCheck]] in a FORKED JVM: the shared test session is
  * pinned to the in-memory catalog (`spark.sql.catalogImplementation` is a
  * static conf), so the hive-metastore-backed registration path can only
  * be exercised in a process of its own. The check itself — register via
  * [[CatalogSync.syncToSessionCatalog]], stop the world, re-open the
  * embedded-derby metastore from a fresh SparkContext, read by name,
  * assert the metastore entry's provider — lives in the main; this spec
  * asserts its exit code and marker output.
  */
class CatalogSyncHiveSpec extends AnyFunSuite {

  test("hive-backed catalog sync survives a session restart (forked JVM)") {
    val work = Files.createTempDirectory("graft-hivesync").toString
    val out = Files.createTempFile("graft-hivesync", ".log").toFile
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.sources.HiveSyncCheck", work)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out)
    val p = pb.start()
    val finished = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val log = new String(Files.readAllBytes(out.toPath), "UTF-8")
    assert(finished, "HiveSyncCheck timed out after 10 minutes")
    assert(p.exitValue() == 0,
      s"HiveSyncCheck exited ${p.exitValue()}; tail:\n${log.takeRight(4000)}")
    assert(log.contains("[hivesync] OK"),
      s"missing OK marker; tail:\n${log.takeRight(4000)}")
  }
}
