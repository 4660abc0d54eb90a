package graft

import scala.jdk.CollectionConverters._

/** Launch a sibling JVM with this test JVM's classpath and JDK-17
  * --add-opens set — the cross-process halves of the concurrency and
  * artifact-store specs. */
object ForkedJvm {
  def launch(mainClass: String, args: Seq[String],
      xmx: String = "2g"): Process = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val addOpens = inArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens") Seq(a, inArgs(i + 1))
      else if (a.startsWith("--add-opens=")) Seq(a)
      else Nil
    }
    new ProcessBuilder((Seq(javaBin) ++ addOpens ++
      Seq(s"-Xmx$xmx", "-cp", cp, mainClass) ++ args).asJava)
      .redirectErrorStream(true).start()
  }

  /** Drain stdout and wait; returns (exitCode, output). */
  def finish(p: Process): (Int, String) = {
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }
}
