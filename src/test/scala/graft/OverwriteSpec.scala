package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.GraftArray

/** INSERT OVERWRITE / `writeTo(..).overwrite(cond)` as ONE atomic
  * fragment carrying both the new data files and the delete predicate
  * that unmasks the replaced rows — plus the manifest-level pruning
  * that makes truncated history cost zero I/O. */
class OverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_ow").toString
    val cat = "go" + scala.util.Random.alphanumeric.take(4).mkString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val parts = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions }.flatten
    parts.map {
      case g: graft.sources.v2.GraftInputPartition => g.files.size
      case _ => 1
    }.sum
  }

  test("INSERT OVERWRITE replaces content atomically; history intact") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 3.0)")
    val pre = GraftArray.fragments(spark, s"$wh/t").map(_.timestamp).max
    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (7, 7.0), (8, 8.0)")
    assert(spark.table(s"$cat.t").orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((7L, 7.0), (8L, 8.0)))
    // ONE new fragment: data files + TrueP delete predicate together
    val frags = GraftArray.fragments(spark, s"$wh/t")
    assert(frags.size == 3)
    val ow = frags.maxBy(_.timestamp)
    assert(ow.files.nonEmpty && ow.deletePred.isDefined &&
      ow.origin.contains("overwrite"))
    // time travel below the overwrite sees the old content
    assert(spark.sql(s"SELECT * FROM $cat.`t@$pre`").count() == 3)
    // manifest-level pruning: the overwritten fragments plan ZERO
    // files — truncated history is skipped, not scanned-and-masked
    assert(plannedFiles(spark.table(s"$cat.t")) ==
      ow.files.size)
  }

  test("predicate overwrite replaces the dim range only, atomically") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.p (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.p VALUES (1, 1.0), (5, 5.0), (9, 9.0)")
    Seq((4L, 40.0), (5L, 50.0)).toDF("k", "v")
      .writeTo(s"$cat.p").overwrite(col("k") >= 4L && col("k") <= 6L)
    assert(spark.table(s"$cat.p").orderBy("k").as[(Long, Double)]
      .collect().toSeq ==
      Seq((1L, 1.0), (4L, 40.0), (5L, 50.0), (9L, 9.0)))
    val ow = GraftArray.fragments(spark, s"$wh/p").maxBy(_.timestamp)
    assert(ow.files.nonEmpty && ow.deletePred.isDefined)
    // a later plain insert is NOT masked by the earlier overwrite
    spark.sql(s"INSERT INTO $cat.p VALUES (6, 6.0)")
    assert(spark.table(s"$cat.p").count() == 5)
  }

  test("attribute-predicate overwrite fails loudly") {
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.a (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.a VALUES (1, 1.0)")
    val e = intercept[Exception] {
      Seq((2L, 2.0)).toDF("k", "v").writeTo(s"$cat.a")
        .overwrite(col("v") > 0.0)
    }
    assert(e != null)
    assert(spark.table(s"$cat.a").count() == 1)
  }

  test("dynamic overwrite and TRUNCATE degenerate to replace-all") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.d (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.d VALUES (1, 1.0), (2, 2.0)")
    Seq((9L, 9.0)).toDF("k", "v").writeTo(s"$cat.d").overwritePartitions()
    assert(spark.table(s"$cat.d").as[(Long, Double)].collect().toSeq ==
      Seq((9L, 9.0)))
    spark.sql(s"TRUNCATE TABLE $cat.d")
    assert(spark.table(s"$cat.d").count() == 0)
    // truncated: zero files planned despite data-bearing fragments
    assert(plannedFiles(spark.table(s"$cat.d")) == 0)
    assert(GraftArray.fragments(spark, s"$wh/d").size == 3)
  }

  test("encrypted arrays: full overwrite + TRUNCATE work, predicate refused") {
    val (cat, wh) = mkCat()
    spark.conf.set(graft.core.EncryptionKeys.ConfKey,
      "000102030405060708090a0b0c0d0e0f")
    spark.sql(s"""CREATE TABLE $cat.e (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k',
      |  'graft.encrypted'='true')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.e VALUES (1, 1.0)")
    // TrueP carries no values — nothing leaks into the manifest
    spark.sql(s"INSERT OVERWRITE $cat.e VALUES (2, 2.0)")
    assert(spark.table(s"$cat.e").as[(Long, Double)].collect().toSeq ==
      Seq((2L, 2.0)))
    spark.sql(s"TRUNCATE TABLE $cat.e")
    assert(spark.table(s"$cat.e").count() == 0)
    // a value-bearing predicate would persist plaintext → refused
    val e = intercept[Exception] {
      Seq((3L, 3.0)).toDF("k", "v").writeTo(s"$cat.e")
        .overwrite(col("k") === 3L)
    }
    assert(e != null)
    // unconditional DELETE takes the TrueP metadata path on encrypted
    spark.sql(s"INSERT INTO $cat.e VALUES (4, 4.0)")
    spark.sql(s"DELETE FROM $cat.e")
    assert(spark.table(s"$cat.e").count() == 0)
    assert(GraftArray.fragments(spark, s"$wh/e")
      .forall(f => f.deletePred.forall(_.contains("true"))))
  }

  test("full consolidation absorbs overwrite fragments; windowed skips") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.c (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.c VALUES (1, 1.0), (2, 2.0)")
    val mid = GraftArray.fragments(spark, s"$wh/c").map(_.timestamp).max
    Seq((2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .writeTo(s"$cat.c").overwrite(col("k") >= 2L)
    // windowed consolidation refuses the window holding the overwrite
    assert(GraftArray.consolidate(spark, s"$wh/c",
      since = Some(mid + 1)).isEmpty)
    // full consolidation applies the delete physically
    assert(GraftArray.consolidate(spark, s"$wh/c").isDefined)
    assert(GraftArray.vacuum(spark, s"$wh/c") == 2)
    val left = GraftArray.fragments(spark, s"$wh/c")
    assert(left.size == 1 && left.head.deletePred.isEmpty)
    assert(spark.table(s"$cat.c").orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)))
  }

  test("empty-source overwrite still deletes the range") {
    // INSERT OVERWRITE with zero input rows commits a files-less
    // fragment carrying only the delete predicate — the range empties
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.z (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.z VALUES (1, 1.0), (5, 5.0)")
    Seq.empty[(Long, Double)].toDF("k", "v").writeTo(s"$cat.z")
      .overwrite(col("k") >= 5L)
    assert(spark.table(s"$cat.z").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.0)))
    val ow = GraftArray.fragments(spark, s"$wh/z").maxBy(_.timestamp)
    assert(ow.files.isEmpty && ow.rows == 0 && ow.deletePred.isDefined)
  }

  test("stats aggregates stay pushed across the overwrite-refresh cycle") {
    // the refresh pattern: periodically rewrite the table via INSERT
    // OVERWRITE. The overwrite's TrueP marker has nothing older left
    // to mask once planning drops truncated history, so stats-only
    // aggregation keeps answering with zero I/O — only a marker that
    // still masks live older rows disables it
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.s (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.s VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"INSERT OVERWRITE $cat.s VALUES (1, 10.0), (3, 30.0)")
    // appends AFTER the overwrite are newer than the marker — pushable
    spark.sql(s"INSERT INTO $cat.s VALUES (4, 2.0)")
    val agg = spark.table(s"$cat.s")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"), "overwrite must not disable stats aggs")
    assert(agg.as[(Double, Long)].head() == ((42.0, 3L)))
    // a dim DELETE with live older rows DOES disable the stats path
    spark.sql(s"DELETE FROM $cat.s WHERE k = 1")
    val agg2 = spark.table(s"$cat.s").agg(sum("v").as("sv"))
    assert(!agg2.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    assert(agg2.as[Double].head() == 32.0)
    // COUNT(*) straight after TRUNCATE answers from the manifest
    spark.sql(s"TRUNCATE TABLE $cat.s")
    val agg3 = spark.table(s"$cat.s")
      .agg(count(lit(1)).as("n"), min("v").as("mn"))
    assert(agg3.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    assert(agg3.as[(Long, Option[Double])].head() == ((0L, None)))
  }

  test("delete markers survive dim pruning of their carrying fragment") {
    // regression: a MERGE/OVERWRITE fragment's MBR covers its DATA
    // rows, not the rows it DELETES — dim pruning that deselects the
    // fragment must not drop its tombstone, or deleted rows would
    // resurrect in range scans that miss the fragment's own data
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.r (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.r VALUES (3, 3.0), (50, 5.0)")
    // MERGE deletes k=3 but writes only k=50 → fragment MBR = [50,50]
    Seq((3L, -1.0), (50L, 500.0)).toDF("k", "nv")
      .createOrReplaceTempView("ow_src")
    spark.sql(
      s"""MERGE INTO $cat.r t USING ow_src s ON t.k = s.k
         |WHEN MATCHED AND s.nv < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    // the scan below prunes to MBRs overlapping k≤10: the MERGE
    // fragment (MBR [50,50]) is deselected — its coordinate delete
    // must still mask k=3
    assert(spark.table(s"$cat.r").filter(col("k") <= 10L).count() == 0)
    // same for a predicate overwrite whose new data lies elsewhere
    Seq((60L, 6.0)).toDF("k", "v").writeTo(s"$cat.r")
      .overwrite(col("k") <= 10L || col("k") >= 55L)
    assert(spark.table(s"$cat.r").filter(col("k") <= 10L).count() == 0)
    assert(spark.table(s"$cat.r").orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((50L, 500.0), (60L, 6.0)))
  }
}
