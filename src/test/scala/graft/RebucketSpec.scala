package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.sources.GraftArray

/** `CALL cat.rebucket('t', n)`: bucket-count evolution + one
  * bucket-complete rewrite. The interesting states are the LAYOUT
  * transitions — DML fragments read under UnknownPartitioning, the
  * rewrite re-arms KeyGroupedPartitioning at the NEW count — and the
  * time-travel contract (old instants keep their rows; layout only
  * degrades, never lies). */
class RebucketSpec extends SparkSpec {

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_rbk").toString
    val cat = "gr" +
      scala.util.Random.alphanumeric.take(4).mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def keyGroupedN(cat: String, t: String): Option[Int] =
    spark.table(s"$cat.$t").queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.v2.GraftScanImpl]
      .outputPartitioning() match {
      case k: org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning => Some(k.numPartitions())
      case _ => None
    }

  test("rebucket merges DML fragments and re-arms grouping at the new count") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.rb (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='2',
      |  'graft.allows_dups'='true')""".stripMargin)
    spark.range(0, 100)
      .select(col("id").as("k"), col("id").cast("double").as("v"))
      .createOrReplaceTempView("rb_src0")
    spark.range(100, 250)
      .select(col("id").as("k"), col("id").cast("double").as("v"))
      .createOrReplaceTempView("rb_src1")
    spark.sql(s"INSERT INTO $cat.rb SELECT * FROM rb_src0")
    spark.sql(s"INSERT INTO $cat.rb SELECT * FROM rb_src1")
    // DML fragments are never bucket-complete → no key grouping
    assert(keyGroupedN(cat, "rb").isEmpty,
      "DML fragments must degrade the bucketed layout")
    val ts = spark.sql(s"CALL $cat.rebucket('rb', 4)").collect()
    assert(ts.length == 1 && !ts.head.isNullAt(0), "rewrite must happen")
    assert(keyGroupedN(cat, "rb").contains(4),
      "rebucket must re-arm key grouping at the NEW count")
    val frags = GraftArray.store(spark, s"$wh/rb").listFragments(None)
    assert(frags.size == 1 && frags.head.buckets.contains(4))
    assert(spark.table(s"$cat.rb").count() == 250)
    assert(spark.table(s"$cat.rb").agg(sum(col("v"))).head.getDouble(0)
      == (0 until 250).map(_.toDouble).sum)
    // replayable DDL reflects the evolved count
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.rb")
      .head.getString(0)
    assert(ddl.contains("'graft.buckets' = '4'"),
      s"SHOW CREATE must carry the new bucket count:\n$ddl")
  }

  test("rebucket 0 removes bucketing; same-count call is a no-op") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.rb2 (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='2',
      |  'graft.allows_dups'='true')""".stripMargin)
    GraftArray.write(spark, s"$wh/rb2", spark.range(0, 50)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    assert(keyGroupedN(cat, "rb2").contains(2))
    // same count → no-op: no schema churn, no rewrite
    val noop = spark.sql(s"CALL $cat.rebucket('rb2', 2)").collect()
    assert(noop.head.isNullAt(0), "same-count rebucket must be a no-op")
    assert(GraftArray.store(spark, s"$wh/rb2")
      .listFragments(None).size == 1)
    val ts = spark.sql(s"CALL $cat.rebucket('rb2', 0)").collect()
    assert(!ts.head.isNullAt(0))
    assert(keyGroupedN(cat, "rb2").isEmpty, "n<=0 must remove bucketing")
    assert(spark.table(s"$cat.rb2").count() == 50)
  }

  test("pre-rebucket time travel keeps its rows under the old schema") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.rb3 (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k', 'graft.buckets'='2',
      |  'graft.allows_dups'='true')""".stripMargin)
    GraftArray.write(spark, s"$wh/rb3", spark.range(0, 40)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    val t1 = GraftArray.store(spark, s"$wh/rb3")
      .listFragments(None).map(_.timestamp).max
    GraftArray.write(spark, s"$wh/rb3", spark.range(40, 90)
      .select(col("id").as("k"), col("id").cast("double").as("v")))
    spark.sql(s"CALL $cat.rebucket('rb3', 8)")
    // asOf t1: the consolidated fragment (committed at the SECOND
    // write's ts) is invisible; the first fragment answers, under the
    // old schema version — correct rows, conservative layout
    val old = spark.read.format("graftarray")
      .option("path", s"$wh/rb3").option("asOfTimestamp", t1.toString)
      .load()
    assert(old.count() == 40)
    assert(spark.table(s"$cat.rb3").count() == 90)
  }
}
