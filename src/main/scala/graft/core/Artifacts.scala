package graft.core

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

/** Cross-process store for per-dataset DERIVED artifacts — the d13/d16
  * measured pair index, the staged real-codec media corpora, the ANN
  * index arrays. Round-11 parked these behind JVM-local
  * `ConcurrentHashMap` + fresh temp dirs: correct in-process, but a
  * NEW JVM silently rebuilt every artifact and only the bench's
  * pass-min hid the cost. Here an artifact lives at a DETERMINISTIC
  * location derived from (kind, dataset key) with the source
  * manifest signature recorded in a `_graft_manifest` file, so a
  * fresh process finds it warm and a regenerated corpus (signature
  * change) rebuilds exactly once.
  *
  * Layout: `<root>/<kind>/<sha1(datasetKey)>/<sha1(sig)>/…` with the
  * manifest written by the builder INSIDE a private temp sibling and
  * the whole directory atomically RENAMED into place — a reader never
  * observes a half-built artifact, and two processes racing the same
  * build resolve by rename: the loser's rename fails against the
  * existing directory, it discards its temp copy and reads the
  * winner's. Stale signature dirs (regenerated corpus) are removed
  * best-effort after the new one lands.
  *
  * Root: `spark.graft.artifacts.dir` when set, else
  * `<java.io.tmpdir>/graft_artifacts` — NEVER inside the (read-only)
  * dataset directory, but stable across JVMs on the same host; a
  * deployment points the conf at a path next to the dataset on the
  * shared filesystem.
  *
  * The in-JVM layer is a memoized-FUTURE map: `computeIfAbsent` never
  * runs the build while holding the bin lock (a concurrent build of a
  * DIFFERENT dataset hashing to the same bin must not block for the
  * whole Spark job), and a failed build removes its entry so the next
  * caller retries. */
object Artifacts {

  /** One ledger row per resolve: did this call BUILD (vs find warm)?
    * Drained by Bench into BENCH_FULL.json's `staged_builds` so a run
    * always records which pass paid which build. */
  final case class BuildRecord(kind: String, dataset: String,
      path: String, built: Boolean, ms: Long)

  private val ledger = java.util.Collections.synchronizedList(
    new java.util.ArrayList[BuildRecord]())

  /** Snapshot and clear the build ledger (bench epilogue). */
  def drainBuildRecords(): Seq[BuildRecord] = ledger.synchronized {
    val out = scala.jdk.CollectionConverters
      .ListHasAsScala(ledger).asScala.toList
    ledger.clear()
    out
  }

  private val memo = new ConcurrentHashMap[String, CompletableFuture[String]]()

  /** Test hook: forget the in-JVM memo so a spec can prove the
    * ON-DISK manifest (not this map) is what makes a second session /
    * process find the artifact warm. */
  private[graft] def clearMemoForTests(): Unit = memo.clear()

  def root(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption("spark.graft.artifacts.dir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_artifacts")

  private def sha1hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  private val ManifestFile = "_graft_manifest"

  /** Resolve the artifact for `(kind, datasetKey)` at signature `sig`,
    * building it with `build(tmpDir)` only when no completed build
    * with the same signature exists on disk. `build` must write
    * everything UNDER the directory it is given; publication is the
    * atomic rename. Returns the final artifact directory. */
  def resolveOrBuild(spark: org.apache.spark.sql.SparkSession,
      kind: String, datasetKey: String, sig: String)
      (build: String => Unit): String = {
    // the memo key includes the ROOT: a session re-pointing
    // spark.graft.artifacts.dir must never be served a path memoized
    // under the previous root
    val key = s"${root(spark)}|$kind|$datasetKey|$sig"
    val fresh = new CompletableFuture[String]()
    val f = memo.putIfAbsent(key, fresh) match {
      case null =>
        // this thread owns the build slot; the map holds only the
        // future, so no bin lock is held while Spark jobs run
        try fresh.complete(
          resolveOnDisk(root(spark), kind, datasetKey, sig, build))
        catch {
          case e: Throwable =>
            memo.remove(key, fresh)
            fresh.completeExceptionally(e)
        }
        fresh
      case existing => existing
    }
    try f.join()
    catch {
      case e: java.util.concurrent.CompletionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }

  private def resolveOnDisk(rootDir: String, kind: String,
      datasetKey: String, sig: String, build: String => Unit): String = {
    val keyDir = new File(new File(rootDir, sanitize(kind)),
      sha1hex(datasetKey))
    val finalDir = new File(keyDir, sha1hex(sig))
    val manifest = new File(finalDir, ManifestFile)
    val t0 = System.nanoTime()
    if (manifest.isFile &&
        new String(Files.readAllBytes(manifest.toPath),
          StandardCharsets.UTF_8).linesIterator.next() == sig) {
      ledger.add(BuildRecord(kind, datasetKey, finalDir.toString,
        built = false, ms = (System.nanoTime() - t0) / 1000000))
      return finalDir.toString
    }
    Files.createDirectories(keyDir.toPath)
    val tmp = new File(keyDir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    Files.createDirectories(tmp.toPath)
    try {
      build(tmp.toString)
      // manifest lands INSIDE tmp before the rename: after a
      // successful rename the artifact is complete by construction
      Files.write(new File(tmp, ManifestFile).toPath,
        (sig + "\n" + datasetKey + "\n").getBytes(StandardCharsets.UTF_8))
      if (!tmp.renameTo(finalDir)) {
        // another process won the race — its artifact is complete
        // (directories only appear via rename); discard ours
        if (!new File(finalDir, ManifestFile).isFile)
          throw new IllegalStateException(
            s"artifact rename failed and no completed build at $finalDir")
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
      } else {
        // regenerated corpus: reclaim stale signature dirs best-effort
        Option(keyDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName != finalDir.getName &&
            !f.getName.startsWith(".tmp-"))
          .foreach(f =>
            try org.apache.commons.io.FileUtils.deleteDirectory(f)
            catch { case _: Throwable => () })
      }
    } catch {
      case e: Throwable =>
        try org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        catch { case _: Throwable => () }
        throw e
    }
    ledger.add(BuildRecord(kind, datasetKey, finalDir.toString,
      built = true, ms = (System.nanoTime() - t0) / 1000000))
    finalDir.toString
  }

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_' || c == '-') c else '_')

  /** Exact-round-trip float matrix persistence for driver-side model
    * state that must survive the process (IVF centroids): one line per
    * row, `Float.toString` per value — `parseFloat(toString(f)) == f`
    * exactly, so a warm process serves IDENTICAL probe routing. */
  def writeFloatMatrix(dir: String, name: String,
      m: Array[Array[Float]]): Unit =
    Files.write(Paths.get(dir, name),
      m.map(_.map(_.toString).mkString(",")).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

  def readFloatMatrix(dir: String, name: String): Array[Array[Float]] =
    new String(Files.readAllBytes(Paths.get(dir, name)),
      StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty)
      .map(_.split(',').map(java.lang.Float.parseFloat)).toArray
}
