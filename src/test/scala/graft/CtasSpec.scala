package graft

import graft.sources.GraftArray

/** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT through the graft
  * catalog: Spark's non-staged CTAS path (createTable + append, drop
  * on failure) composes with `graft.*` table properties — schema comes
  * from the query, dimensions/options from TBLPROPERTIES. */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    val cat = "gc" + scala.util.Random.alphanumeric.take(4).mkString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("CTAS creates the array and loads the query result") {
    val (cat, wh) = mkCat()
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "v", "s").createOrReplaceTempView("ctas_src")
    spark.sql(s"""CREATE TABLE $cat.t
      |TBLPROPERTIES('graft.dimensions'='k')
      |AS SELECT * FROM ctas_src WHERE k <= 2""".stripMargin)
    assert(spark.table(s"$cat.t").orderBy("k")
      .as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")))
    // a real array on disk: schema manifest + one fragment
    val frags = GraftArray.fragments(spark, s"$wh/t")
    assert(frags.size == 1 && frags.head.rows == 2)
    // the created table keeps full array semantics — upsert works
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 99.0, 'z')")
    assert(spark.table(s"$cat.t").orderBy("k")
      .as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 10.0, "a"), (2L, 99.0, "z")))
  }

  test("CTAS into a dense array with typed options") {
    val (cat, _) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.d
      |TBLPROPERTIES('graft.dimensions'='k',
      |  'graft.dense'='true', 'graft.lower.k'='1', 'graft.upper.k'='4',
      |  'graft.fill.v'='-1.0')
      |AS SELECT * FROM VALUES (1L, 1.5D), (3L, 3.5D) AS t(k, v)"""
      .stripMargin)
    // unwritten cells of the non-empty domain materialize fills
    assert(spark.table(s"$cat.d").orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 1.5), (2L, -1.0), (3L, 3.5)))
  }

  test("REPLACE TABLE AS SELECT swaps schema and content") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.r
      |TBLPROPERTIES('graft.dimensions'='k')
      |AS SELECT * FROM VALUES (1L, 1.0D) AS t(k, v)""".stripMargin)
    spark.sql(s"""REPLACE TABLE $cat.r
      |TBLPROPERTIES('graft.dimensions'='k')
      |AS SELECT * FROM VALUES (9L, 'nine') AS t(k, s)""".stripMargin)
    assert(spark.table(s"$cat.r").as[(Long, String)].collect().toSeq ==
      Seq((9L, "nine")))
    // the old array is gone, not merged: one fragment, new schema
    assert(GraftArray.fragments(spark, s"$wh/r").size == 1)
  }

  test("failed CTAS leaves no table behind") {
    val (cat, _) = mkCat()
    // graft.dimensions references a column the query does not produce
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.bad
        |TBLPROPERTIES('graft.dimensions'='nope')
        |AS SELECT * FROM VALUES (1L, 1.0D) AS t(k, v)""".stripMargin)
    }
    assert(e != null)
    assert(!spark.catalog.tableExists(s"$cat.bad"))
  }
}
