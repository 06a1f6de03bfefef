package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Spawns a fresh JVM whose ONLY registration route is
  * `spark.sql.extensions=graft.plans.GraftExtensions` and asserts the SQL
  * results match the local kernels bit-for-bit — extensions bind at
  * session construction, so the shared test session cannot exercise this.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions alone wires canon_url/host_of/bpe_token_count into SQL") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
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
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.plans.ExtensionsCheck")).asJava
    val p = new ProcessBuilder(cmd).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"ExtensionsCheck JVM failed:\n$out")
    val line = out.linesIterator.find(_.startsWith("EXTCHECK|"))
      .getOrElse(fail(s"no EXTCHECK line in:\n$out"))
    val Array(_, c, h, t) = line.split("\\|")
    assert(c == graft.functions.UrlKit.canonicalize("HTTP://News1.Example.COM:80/a/../b#f"))
    assert(h == graft.functions.UrlKit.hostOf("http://a.b.c:8080/x"))
    assert(t.toLong == graft.functions.TextKit.bpeTokenCount("hello, extension world"))
  }
}
