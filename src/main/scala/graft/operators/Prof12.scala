package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for round-12 optimization (not a shipped
  * path): times the sub-stages of the hot dedup/similarity pipelines
  * so optimization targets are measured, not guessed. */
object Prof12 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = if (args.isEmpty) Set("minhash", "cc", "lsh", "arr")
      else args.toSet

    val reps0 = sys.env.getOrElse("GRAFT_PROF_REPS", "1").toInt
    if (which("minhash")) for (rep <- 1 to reps0) {
      println(s"[prof] --- minhash rep $rep")
      val dd = graft.Tables.load(s, d, "documents")
      // warm up input scan
      dd.count()
      val layout = time("lshLayoutOf (warm artifact)")(
        Dedup.lshLayoutOf(s, d))
      val members = time("minhash members+checkpoint")(
        Dedup.minhashMembers(dd).localCheckpoint())
      val reps = time("reps filter+checkpoint")(
        members.filter(col("doc_id") === col("gid"))
          .select(col("gid"), col("sh")).localCheckpoint())
      println(s"[prof]   members=${members.count()} reps=${reps.count()}")
      val bands = time("band rows (incl hot-band collect)")(
        Dedup.minhashBandRows(reps, Some(Dedup.HotBandCap), layout)
          .localCheckpoint())
      println(s"[prof]   band rows=${bands.count()}")
      time("band self-join emitted (no distinct)")(
        bands.as("a").join(bands.as("b"), "band")
          .filter(col("a.gid") < col("b.gid")).count())
      time("band self-join distinct")(
        bands.as("a").join(bands.as("b"), "band")
          .filter(col("a.gid") < col("b.gid"))
          .select(col("a.gid").as("ga"), col("b.gid").as("gb"))
          .distinct().count())
      time("full minhashVerifiedPairs")(
        Dedup.minhashVerifiedPairs(dd, 0.8, layout).count())
      val edges = Dedup.minhashVerifiedPairs(dd, 0.8, layout)
        .select("i", "j").localCheckpoint()
      println(s"[prof]   edges=${edges.count()}")
      time("connectedComponents on d3 edges")(
        Dedup.connectedComponents(edges).count())
      time("full d5 (pairs+CC)")(
        Dedup.queries("d5_dup_clusters")(s, d).count())
    }

    if (which("lsh")) {
      val e = graft.Tables.load(s, d, "embeddings")
      e.count()
      val tagged = time("lsh tagged (collapse)+checkpoint")(
        Dedup.collapseIdenticalKeys(
          e.select(col("vec_id"),
            graft.functions.expressions.Kernels.lshBands(col("embedding"),
              Array.tabulate(32 * 4, 64)((p, dd2) =>
                graft.functions.VectorFunctions.planeCoef(p, dd2).toFloat),
              4).as("bands")),
          col("bands"), "vec_id").localCheckpoint())
      println(s"[prof]   vectors=${tagged.count()}")
      val reps = tagged.filter(col("vec_id") === col("gid"))
        .select(col("gid"), col("bands"))
      val bandRows = time("band rows + hot collect")(
        Dedup.dropHotBands(
          reps.select(col("gid"), explode(col("bands")).as("band")),
          Some(Dedup.HotBandCap)).localCheckpoint())
      println(s"[prof]   band rows=${bandRows.count()}")
      time("band self-join emitted (no distinct)")(
        bandRows.as("a").join(bandRows.as("b"), "band")
          .filter(col("a.gid") < col("b.gid")).count())
      time("band self-join distinct")(
        bandRows.as("a").join(bandRows.as("b"), "band")
          .filter(col("a.gid") < col("b.gid"))
          .select(col("a.gid").as("ga"), col("b.gid").as("gb"))
          .distinct().count())
      time("full lshVerifiedPairs")(
        Similarity.lshVerifiedPairs(e).count())
      val edges = Similarity.lshVerifiedPairs(e)
        .select("i", "j").localCheckpoint()
      println(s"[prof]   edges=${edges.count()}")
      time("CC on v5 edges")(
        Dedup.connectedComponents(edges).count())
      time("full v5")(
        Similarity.queries("v5_embedding_clusters")(s, d).count())
    }

    if (which("cc")) {
      // CC job-latency anatomy on a tiny fixed graph
      import s.implicits._
      val edges = (0L until 400L).map(i => (i, i + 1))
        .toDF("i", "j").repartition(32).localCheckpoint()
      time("CC chain-401 (log-diameter rounds)")(
        Dedup.connectedComponents(edges).count())
      val edges2 = (0L until 400L by 2).map(i => (i, i + 1))
        .toDF("i", "j").repartition(32).localCheckpoint()
      time("CC 200 pairs (2 rounds)")(
        Dedup.connectedComponents(edges2).count())
    }

    if (which("st17")) for (rep <- 1 to reps0) {
      println(s"[prof] --- st17 rep $rep")
      val path = s"$d/events.parquet"
      import graft.streaming.EventPipeline
      val work = s.newSession()
      work.conf.set("spark.sql.shuffle.partitions", "2")
      val thr = time("footer rows (thr)")(
        work.read.parquet(path).count() * 3 / 8)
      val staged = graft.core.TempDirs.fresh("graft_prof17")
      time("stage 6 slices (pass-1 only in bench)") {
        val ev = work.read.parquet(path)
          .transform(graft.Tables.normalizeTs)
        (0 until 6).foreach { k =>
          ev.filter(pmod(col("event_id"), lit(8L)) <= 5 &&
              pmod(col("event_id"), lit(8L)) === k)
            .select("event_id", "user_id", "event_type", "value")
            .coalesce(1).write.parquet(s"$staged/b$k")
        }
      }
      val uri = graft.core.TempDirs.fresh("graft_prof17_arr") + "/arr"
      graft.sources.GraftArray.create(work, uri,
        graft.core.ArraySchema(graft.core.ArrayKind.Sparse,
          Seq(graft.core.DimensionSpec("event_id",
            org.apache.spark.sql.types.LongType)),
          Seq(graft.core.AttributeSpec("user_id",
              org.apache.spark.sql.types.LongType),
            graft.core.AttributeSpec("event_type",
              org.apache.spark.sql.types.StringType),
            graft.core.AttributeSpec("value",
              org.apache.spark.sql.types.DoubleType))))
      def ingest(glob: Seq[Int], sinkId: String): Unit = {
        val schema = work.read.parquet(s"$staged/b${glob.head}").schema
        val src = graft.core.TempDirs.fresh(s"graft_prof17_$sinkId")
        glob.foreach { k =>
          val w = java.nio.file.Files.walk(
            java.nio.file.Paths.get(s"$staged/b$k"))
          try w.forEach { p =>
            if (!java.nio.file.Files.isDirectory(p))
              java.nio.file.Files.copy(p, java.nio.file.Paths.get(
                s"$src/${k}_${p.getFileName}"))
          } finally w.close()
        }
        val q = EventPipeline.writeStreamToArray(
          work.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src),
          uri, sinkId)
        try { q.processAllAvailable() } finally q.stop()
      }
      time("ingest wave A (4 micro-batches)")(ingest(0 until 4, s"pA$rep"))
      time("consolidateSmall A")(
        graft.sources.GraftArray.consolidateSmall(work, uri, thr))
      time("ingest wave B (2 micro-batches)")(ingest(Seq(4, 5), s"pB$rep"))
      time("consolidateSmall B")(
        graft.sources.GraftArray.consolidateSmall(work, uri, thr))
      time("vacuum")(graft.sources.GraftArray.vacuum(work, uri))
      time("fragments list + final agg read") {
        graft.sources.GraftArray.fragments(work, uri).size
        work.read.format("graftarray").option("path", uri).load()
          .groupBy("event_type").agg(count(lit(1))).count()
      }
      time("FULL st17 query")(
        StreamOps.queries("st17_stream_compact_loop")(s, d).count())
    }

    if (which("st16")) for (rep <- 1 to reps0) {
      println(s"[prof] --- st16 rep $rep")
      time("FULL st16 query")(
        StreamOps.queries("st16_stream_outer_join")(s, d).count())
      time("FULL st11 query")(
        StreamOps.queries("st11_stream_distinct")(s, d).count())
    }

    if (which("st12")) for (rep <- 1 to reps0) {
      println(s"[prof] --- st12 rep $rep")
      val dd = graft.Tables.load(s, d, "documents")
      import graft.functions.TextFunctions.fingerprint
      val keyed = time("keyed fingerprints df (lazy)")(
        dd.select(col("doc_id"), fingerprint(col("text")).as("fp")))
      val base = keyed.filter(col("doc_id") % 3 =!= 0)
      val (_, hits) = time("bloomOf build (agg to driver)")(
        Dedup.bloomOf(s, base, col("fp"), dd))
      time("baseFps distinct count")(
        base.select("fp").distinct().count())
      time("FULL st12 query")(
        StreamOps.queries("st12_stream_bloom_admission")(s, d).count())
    }

    if (which("d2")) for (rep <- 1 to reps0) {
      println(s"[prof] --- d2 rep $rep")
      val dd = graft.Tables.load(s, d, "documents")
      dd.count()
      val sets = time("shingle sets + checkpoint")(
        dd.select(col("doc_id"),
          graft.functions.TextFunctions.shingles(col("text"), 5).as("sh"))
          .localCheckpoint())
      val cands = time("candidatePairs (capped index self-join)")(
        Dedup.candidatePairs(dd, Some(5000L / 100)).localCheckpoint())
      println(s"[prof]   candidates=${cands.count()}")
      time("FULL d2 query")(
        Dedup.queries("d2_ngram_jaccard")(s, d).count())
    }

    // Dump the collapse's INTERNAL join plan in both regimes — the
    // declared queries eagerly localCheckpoint the collapse result, so
    // their own explain() never shows this join (the r13 plan-evidence
    // gap): below the gate the member join-back must be a
    // BroadcastHashJoin over checkpointed blocks (zero Exchange on the
    // payload side); with the gate forced to 0 the round-12 shuffled
    // recompute shape must reappear unchanged.
    if (which("collapseplan")) {
      val dd = graft.Tables.load(s, d, "documents")
      def dump(tag: String): Unit = {
        val out = Dedup.minhashMembers(dd)
        println(s"[prof] ===== collapse plan ($tag) =====")
        println(out.queryExecution.executedPlan.toString.take(6000))
      }
      dump("small gate: broadcast join-back over checkpointed blocks")
      s.conf.set("graft.dedup.collapseBroadcastMaxBytes", "0")
      dump("gate forced 0: scale path, shuffled recompute")
      s.conf.unset("graft.dedup.collapseBroadcastMaxBytes")
    }

    if (which("arr")) {
      val li = graft.Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
      li.count()
      println(s"[prof]   lineitem rdd partitions=${li.rdd.getNumPartitions}")
      val sch = graft.core.ArraySchema(
        kind = graft.core.ArrayKind.Sparse,
        dims = Seq(
          graft.core.DimensionSpec("l_orderkey",
            org.apache.spark.sql.types.LongType),
          graft.core.DimensionSpec("l_linenumber",
            org.apache.spark.sql.types.IntegerType)),
        attrs = Seq(
          graft.core.AttributeSpec("l_quantity",
            org.apache.spark.sql.types.DoubleType),
          graft.core.AttributeSpec("l_extendedprice",
            org.apache.spark.sql.types.DoubleType),
          graft.core.AttributeSpec("l_returnflag",
            org.apache.spark.sql.types.StringType),
          graft.core.AttributeSpec("l_shipdate",
            org.apache.spark.sql.types.TimestampType)))
      def mk(tag: String, parts: Option[Int]): Unit = {
        val uri = graft.core.TempDirs.fresh(s"graft_prof_$tag") + "/arr"
        graft.sources.GraftArray.create(s, uri, sch)
        time(s"write lineitem parts=$tag")(
          graft.sources.GraftArray.write(s, uri, li, partitions = parts))
        time(s"read-back filter parts=$tag")(
          s.read.format("graftarray").option("path", uri).load()
            .filter(col("l_orderkey").between(100L, 2000L) &&
              col("l_returnflag") === "A" && col("l_quantity") > 10.0)
            .count())
      }
      mk("default", None)
      mk("4", Some(4))
      mk("1", Some(1))
      mk("default2", None)
      time("full arr1_roundtrip_filter")(
        ArrayOps.queries("arr1_roundtrip_filter")(s, d).count())
    }
    s.stop()
  }
}
