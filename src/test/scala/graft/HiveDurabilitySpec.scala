package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Launches [[HiveDurability]] in a fresh JVM (Spark allows one
  * ExternalCatalog per JVM; this suite's shared session already holds
  * the in-memory one) and asserts the cross-session read-by-name
  * succeeded — the engine-side proof of the reference's crawler
  * persistence (lambda:83-97). */
class HiveDurabilitySpec extends AnyFunSuite {

  // Mirrors build.sbt's JDK-17 module options (spark-submit injects
  // these normally; a bare `java` launch must repeat them).
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("hive-backed catalog entries survive a session+context restart") {
    val work = Files.createTempDirectory("graft_hive").toString
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-XX:+UseParallelGC",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.HiveDurability", work)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val rc = p.waitFor()
    assert(rc == 0 && out.contains("HIVE_DURABILITY_OK"),
      s"HiveDurability rc=$rc\n...${out.takeRight(3000)}")
  }
}
