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
