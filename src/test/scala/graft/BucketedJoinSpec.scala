package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.GraftArray

/** Storage-partitioned joins over `graft.buckets` layouts: two arrays
  * bucketed the same way must join with NO shuffle on either side,
  * and the bucketed layout must never change query answers. */
class BucketedJoinSpec extends SparkSpec {

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val cat = "gb" + scala.util.Random.alphanumeric.take(4).mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("co-bucketed arrays join with no shuffle; answers stay exact") {
    val (cat, wh) = mkCat()
    for (t <- Seq("t1", "t2"))
      spark.sql(s"""CREATE TABLE $cat.$t (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='8',
        |  'graft.allows_dups'='true')""".stripMargin)
    // two fragments per table through the bucketing library write path
    for ((t, mul) <- Seq(("t1", 1.0), ("t2", 10.0)); base <- Seq(0L, 500L))
      GraftArray.write(spark, s"$wh/$t", spark.range(base, base + 500)
        .select(col("id").as("k"), (col("id") * mul).cast("double").as("v")))
    val olds = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k =>
      k -> spark.conf.getOption(k))
    try {
      // negative control: without SPJ the same join shuffles its inputs
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q0 = spark.sql(
        s"SELECT a.k FROM $cat.t1 a JOIN $cat.t2 b ON a.k = b.k")
      assert(q0.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s }.nonEmpty,
        "control failed: expected shuffles with SPJ disabled")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = spark.sql(
        s"""SELECT a.k, a.v, b.v AS w FROM $cat.t1 a
           |JOIN $cat.t2 b ON a.k = b.k ORDER BY a.k""".stripMargin)
      val shuffles = q.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s }
      // the final ORDER BY may range-shuffle the JOIN OUTPUT; the join
      // INPUTS must not be shuffled
      val joins = q.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a shuffled-family join operator")
      val inputShuffles = joins.head.collect {
        case s: ShuffleExchangeExec => s }
      assert(inputShuffles.isEmpty,
        s"join inputs were shuffled:\n${q.queryExecution.executedPlan}")
      val rows = q.collect()
      assert(rows.length == 1000)
      assert(rows.forall(r => r.getDouble(2) == r.getDouble(1) * 10.0))
      assert(shuffles.nonEmpty || rows.map(_.getLong(0)).toSeq ==
        rows.map(_.getLong(0)).toSeq.sorted)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("consolidation restores the bucketed layout after DSv2 writes") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.tc (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='4',
      |  'graft.allows_dups'='true')""".stripMargin)
    GraftArray.write(spark, s"$wh/tc", spark.range(0, 200)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    def keyGrouped(): Boolean = spark.table(s"$cat.tc")
      .queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.v2.GraftScanImpl]
      .outputPartitioning()
      .isInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
    assert(keyGrouped(), "bucketed table must report key grouping")
    // a DSv2 INSERT commits an unbucketed fragment → layout degrades
    spark.sql(s"INSERT INTO $cat.tc VALUES (1000, 1.5)")
    assert(!keyGrouped(), "unbucketed fragment must disable key grouping")
    // consolidation rewrites through the bucketing library write path
    GraftArray.consolidate(spark, s"$wh/tc")
    assert(keyGrouped(), "consolidation must restore the bucketed layout")
    assert(spark.table(s"$cat.tc").count() == 201)
    val frag = GraftArray.store(spark, s"$wh/tc").listFragments(None)
      .filter(_.replaces.nonEmpty).head
    assert(frag.buckets.contains(4))
  }

  test("GROUP BY the bucket dimension aggregates without a shuffle") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.ta (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='8',
      |  'graft.allows_dups'='true')""".stripMargin)
    GraftArray.write(spark, s"$wh/ta", spark.range(0, 1000)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    val olds = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = spark.sql(s"SELECT k, sum(v) AS s FROM $cat.ta GROUP BY k")
      val shuffles = q.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed GROUP BY shuffled:\n${q.queryExecution.executedPlan}")
      assert(q.count() == 1000)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed layout never changes answers; SQL bucket() matches layout") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.tb (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='4',
      |  'graft.allows_dups'='true')""".stripMargin)
    GraftArray.write(spark, s"$wh/tb", spark.range(0, 300)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    val df = spark.table(s"$cat.tb")
    assert(df.count() == 300)
    assert(df.filter(col("k") === 42L).count() == 1)
    assert(df.agg(sum("v")).collect()(0).getDouble(0) == (0 until 300).sum)
    // the catalog SQL function reproduces the physical file routing
    val viaSql = spark.sql(
      s"SELECT $cat.bucket(4, k) AS b, count(*) AS n FROM $cat.tb GROUP BY b")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val frag = GraftArray.store(spark, s"$wh/tb").listFragments(None).head
    assert(frag.buckets.contains(4), s"fragment not bucket-tagged: $frag")
    val viaFiles = frag.fileBuckets.groupBy(_._2)
      .map { case (b, fs) => b -> fs.keys.map(frag.fileRows).sum }
    assert(viaSql == viaFiles, s"$viaSql vs $viaFiles")
  }
}
