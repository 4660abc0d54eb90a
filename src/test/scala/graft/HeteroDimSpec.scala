package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftArray

/** Heterogeneous dimensions (reference t/heterogeneus_dimensions.test,
  * t/mrr_heterogeneus_dimensions.test): a composite coordinate mixing
  * string and integer dims drives latest-wins, pushdown on each dim,
  * row-level deletes on the composite rowId, and consolidation. */
class HeteroDimSpec extends SparkSpec {
  import spark.implicits._

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_het").toString
    val cat = "gh" + scala.util.Random.alphanumeric.take(4).mkString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("latest-wins on a (string, long) composite key across fragments") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.t (sym STRING, seq BIGINT, px DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='sym,seq')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.t VALUES
      |('aapl', 1, 10.0), ('aapl', 2, 11.0), ('msft', 1, 20.0)"""
      .stripMargin)
    // overlapping upsert: same composite coordinates, newer versions
    spark.sql(s"""INSERT INTO $cat.t VALUES
      |('aapl', 2, 11.5), ('msft', 2, 21.0)""".stripMargin)
    assert(spark.table(s"$cat.t").orderBy("sym", "seq")
      .as[(String, Long, Double)].collect().toSeq == Seq(
      ("aapl", 1L, 10.0), ("aapl", 2L, 11.5),
      ("msft", 1L, 20.0), ("msft", 2L, 21.0)))
    // pushdown on each dim independently and together
    assert(spark.table(s"$cat.t").filter(col("sym") === "aapl")
      .count() == 2)
    assert(spark.table(s"$cat.t").filter(col("seq") >= 2L).count() == 2)
    assert(spark.table(s"$cat.t")
      .filter(col("sym").startsWith("ms") && col("seq") === 2L)
      .as[(String, Long, Double)].collect().toSeq ==
      Seq(("msft", 2L, 21.0)))
    // full consolidation collapses to one clustered fragment
    assert(GraftArray.consolidate(spark, s"$wh/t").isDefined)
    assert(GraftArray.vacuum(spark, s"$wh/t") == 2)
    assert(spark.table(s"$cat.t").count() == 4)
  }

  test("row-level MERGE keys on the full composite coordinate") {
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.m (sym STRING, seq BIGINT, px DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='sym,seq')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.m VALUES
      |('a', 1, 1.0), ('a', 2, 2.0), ('b', 1, 3.0)""".stripMargin)
    Seq(("a", 2L, -1.0), ("b", 1L, 9.0), ("c", 7L, 7.0))
      .toDF("s", "q", "nv").createOrReplaceTempView("het_src")
    spark.sql(
      s"""MERGE INTO $cat.m t USING het_src u
         |ON t.sym = u.s AND t.seq = u.q
         |WHEN MATCHED AND u.nv < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET px = u.nv
         |WHEN NOT MATCHED THEN INSERT (sym, seq, px)
         |  VALUES (u.s, u.q, u.nv)""".stripMargin)
    assert(spark.table(s"$cat.m").orderBy("sym", "seq")
      .as[(String, Long, Double)].collect().toSeq == Seq(
      ("a", 1L, 1.0), ("b", 1L, 9.0), ("c", 7L, 7.0)))
    // the deleted composite coordinate stays masked under a partial
    // dim predicate that misses the MERGE fragment's own data
    assert(spark.table(s"$cat.m")
      .filter(col("sym") === "a" && col("seq") === 2L).count() == 0)
  }

  test("SQL DELETE takes composite-dim predicates") {
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.d (sym STRING, seq BIGINT, px DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='sym,seq')""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.d VALUES
      |('a', 1, 1.0), ('a', 2, 2.0), ('b', 5, 5.0)""".stripMargin)
    spark.sql(s"DELETE FROM $cat.d WHERE sym = 'a' AND seq < 2")
    assert(spark.table(s"$cat.d").orderBy("sym", "seq")
      .as[(String, Long, Double)].collect().toSeq ==
      Seq(("a", 2L, 2.0), ("b", 5L, 5.0)))
  }
}
