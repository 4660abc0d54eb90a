package graft.core

/** Session-lifetime temp-dir registry with ONE shutdown hook.
  *
  * Every scratch warehouse/staging dir a query creates goes through
  * `fresh` (or `register` for dirs made elsewhere) so repeated bench
  * iterations in one JVM do not leak a table copy per run — the
  * round-8 hook in ArrayOps covered only its own freshUri dirs and
  * arr29/st8/st9/t6 kept leaking theirs.
  */
object TempDirs {
  private val dirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.io.File]())

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach { d =>
      try org.apache.commons.io.FileUtils.deleteDirectory(d)
      catch { case _: Throwable => () }
    }))

  /** Create a fresh temp dir, registered for exit cleanup. */
  def fresh(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(dir.toFile)
    dir.toString
  }
}
