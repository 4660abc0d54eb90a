package graft

import org.apache.spark.sql.functions._
import graft.core.Artifacts

/** The cross-process derived-artifact store (round-12 verdict #2):
  * artifacts live at deterministic signature-keyed locations, a
  * SECOND session/process finds them WARM on disk (the in-JVM memo is
  * cleared to prove the manifest — not the map — is what's reused), a
  * signature change rebuilds exactly once, and the `CALL cat.*`
  * builders are idempotent. */
class ArtifactsSpec extends SparkSpec {

  private def freshRoot(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_artifacts_spec").toString
    dir
  }

  test("second session reuses the on-disk artifact — no rebuild") {
    val root = freshRoot()
    spark.conf.set("spark.graft.artifacts.dir", root)
    try {
      var builds = 0
      def resolve(s: org.apache.spark.sql.SparkSession): String =
        Artifacts.resolveOrBuild(s, "spec_kind", "dsA", "sig1") { tmp =>
          builds += 1
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "payload.txt"),
            "v1".getBytes("UTF-8"))
        }
      val p1 = resolve(spark)
      assert(builds == 1)
      // drop the in-JVM memo and resolve from a SECOND session: the
      // on-disk manifest must be what makes it warm
      Artifacts.clearMemoForTests()
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.artifacts.dir", root)
      val p2 = resolve(s2)
      assert(builds == 1, "second session rebuilt a warm artifact")
      assert(p2 == p1)
      val payload = new java.io.File(p1, "payload.txt")
      assert(payload.isFile &&
        new String(java.nio.file.Files.readAllBytes(payload.toPath)) == "v1")
      // signature change (regenerated corpus) rebuilds exactly once
      // and reclaims the stale signature dir
      Artifacts.clearMemoForTests()
      val p3 = Artifacts.resolveOrBuild(spark, "spec_kind", "dsA", "sig2") {
        tmp =>
          builds += 1
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "payload.txt"),
            "v2".getBytes("UTF-8"))
      }
      assert(builds == 2)
      assert(p3 != p1)
      assert(!new java.io.File(p1).exists(),
        "stale signature dir not reclaimed")
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }

  test("concurrent resolvers: one build, no lock held across the build") {
    val root = freshRoot()
    spark.conf.set("spark.graft.artifacts.dir", root)
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val started = new java.util.concurrent.CountDownLatch(1)
      // a SLOW build of one key must not block an unrelated key's
      // resolve (the round-11 computeIfAbsent held the bin lock for
      // the whole Spark job — ADVICE finding)
      val slow = new Thread(() =>
        Artifacts.resolveOrBuild(spark, "spec_conc", "slow", "s") { tmp =>
          builds.incrementAndGet()
          started.countDown()
          Thread.sleep(1500)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "x"), Array[Byte](1))
        })
      slow.start()
      started.await()
      val t0 = System.nanoTime()
      Artifacts.resolveOrBuild(spark, "spec_conc", "fast", "s") { tmp =>
        builds.incrementAndGet()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "x"), Array[Byte](2))
      }
      val fastMs = (System.nanoTime() - t0) / 1000000
      assert(fastMs < 1200,
        s"unrelated resolve blocked ${fastMs}ms behind a slow build")
      // many racers on ONE key: the build runs once
      val threads = (1 to 8).map(_ => new Thread(() =>
        Artifacts.resolveOrBuild(spark, "spec_conc", "raced", "s") { tmp =>
          builds.incrementAndGet()
          Thread.sleep(100)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "x"), Array[Byte](3))
        }))
      threads.foreach(_.start())
      threads.foreach(_.join())
      slow.join()
      assert(builds.get() == 3, s"duplicate builds: ${builds.get()}")
      // a failed build leaves no poisoned entry — the next caller
      // retries and succeeds
      intercept[RuntimeException] {
        Artifacts.resolveOrBuild(spark, "spec_conc", "flaky", "s") { _ =>
          throw new RuntimeException("boom")
        }
      }
      val ok = Artifacts.resolveOrBuild(spark, "spec_conc", "flaky", "s") {
        tmp =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "x"), Array[Byte](4))
      }
      assert(new java.io.File(ok, "x").isFile)
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }

  test("two JVMs racing the SAME artifact build: one winner, no debris") {
    // the rename publication protocol across real process boundaries:
    // two forked JVMs and this one all resolve the sf0.001 pair index
    // under one fresh root. All three must converge on the SAME
    // published path; afterwards exactly one signature dir exists,
    // carrying a manifest and a readable pair table, and no .tmp-
    // loser directories remain.
    val root = freshRoot()
    val procs = Seq(1, 2).map(_ => ForkedJvm.launch(
      "graft.ConcurrencyChild", Seq("pair", sf, root)))
    spark.conf.set("spark.graft.artifacts.dir", root)
    try {
      Artifacts.clearMemoForTests()
      val p0 = operators.Dedup.buildPairIndex(spark, sf)
      val childPaths = procs.map { p =>
        val (code, out) = ForkedJvm.finish(p)
        assert(code == 0, s"child failed:\n${out.takeRight(3000)}")
        out.linesIterator.find(_.startsWith("PATH="))
          .getOrElse(fail(s"no PATH line:\n${out.takeRight(1000)}"))
          .stripPrefix("PATH=")
      }
      assert(childPaths.forall(_ == p0), s"$childPaths vs $p0")
      val keyDir = new java.io.File(p0).getParentFile
      val entries = keyDir.listFiles().map(_.getName).toSeq
      assert(entries == Seq(new java.io.File(p0).getName),
        s"debris in $keyDir: $entries")
      assert(new java.io.File(p0, "_graft_manifest").isFile)
      assert(spark.read.parquet(p0 + "/pairs").count() > 0)
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }

  test("CALL cat.build_pair_index / stage_media: idempotent, warm reuse") {
    val root = freshRoot()
    spark.conf.set("spark.graft.artifacts.dir", root)
    val cat = "artcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      graft.core.TempDirs.fresh("graft_artcat"))
    try {
      val p1 = spark.sql(s"CALL $cat.build_pair_index('$sf')")
        .head().getString(0)
      assert(new java.io.File(p1, "pairs").isDirectory)
      val sig1 = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(p1, "_graft_manifest")).get(0)
      val mtimes = new java.io.File(p1, "pairs").listFiles()
        .map(f => (f.getName, f.lastModified())).toMap
      // d13/d16 read the SAME index the CALL built — not a rebuild
      Artifacts.clearMemoForTests()
      val d13 = SparkEntry.queries("d13_jaccard_sweep")(spark, sf)
      assert(d13.count() > 0)
      val p2 = spark.sql(s"CALL $cat.build_pair_index('$sf')")
        .head().getString(0)
      assert(p2 == p1)
      assert(new java.io.File(p1, "pairs").listFiles()
        .map(f => (f.getName, f.lastModified())).toMap == mtimes,
        "warm pair index was rewritten")
      assert(sig1 == Tables.fileSig(s"$sf/documents.parquet"))
      // media staging: the gif artifact key includes the WHERE filter
      // (two prefixes sharing a dataset must not cross-reuse)
      val g1 = spark.sql(s"CALL $cat.stage_media('$sf', 'gif')")
        .head().getString(0)
      assert(new java.io.File(g1, "media").isDirectory)
      Artifacts.clearMemoForTests()
      val g2 = spark.sql(s"CALL $cat.stage_media('$sf', 'gif')")
        .head().getString(0)
      assert(g2 == g1)
      val png = spark.sql(s"CALL $cat.stage_media('$sf', 'png')")
        .head().getString(0)
      assert(png != g1)
      intercept[Exception] {
        spark.sql(s"CALL $cat.stage_media('$sf', 'mp4')").collect()
      }
    } finally spark.conf.unset("spark.graft.artifacts.dir")
  }
}
