package graft

import graft.sources.GraftArray

/** `SHOW CREATE TABLE` parity (reference discovery generates complete
  * CREATE TABLE statements, mytile-discovery.cc:42–473): the emitted
  * DDL carries the full `graft.*` option set and replays into an
  * identical array. */
class ShowCreateSpec extends SparkSpec {

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sct").toString
    val cat = "gs" + scala.util.Random.alphanumeric.take(4).mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("emitted DDL replays into an identical array") {
    val (cat, wh) = mkCat()
    spark.sql(s"""CREATE TABLE $cat.t (
      |  k BIGINT, r BIGINT, v DOUBLE, e STRING, u INT)
      |TBLPROPERTIES('graft.dimensions'='k,r', 'graft.dense'='true',
      |  'graft.lower.k'='0', 'graft.upper.k'='99',
      |  'graft.lower.r'='0', 'graft.upper.r'='9', 'graft.extent.r'='5',
      |  'graft.fill.v'='-1.0', 'graft.enum.e'='a,b,c',
      |  'graft.type.u'='UINT16', 'graft.codec.v'='ZSTD',
      |  'graft.codec'='GZIP', 'graft.capacity'='5000',
      |  'graft.allows_dups'='true')""".stripMargin)
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.t")
      .collect().head.getString(0)
    // every declared option survives into the DDL
    Seq("graft.dimensions' = 'k,r", "graft.dense' = 'true",
      "graft.lower.k' = '0", "graft.upper.k' = '99",
      "graft.extent.r' = '5", "graft.fill.v' = '-1.0",
      "graft.enum.e' = 'a,b,c", "graft.type.u' = 'UINT16",
      "graft.codec.v' = 'ZSTD", "graft.codec' = 'GZIP",
      "graft.capacity' = '5000", "graft.allows_dups' = 'true")
      .foreach(opt => assert(ddl.contains(opt), s"missing $opt in:\n$ddl"))
    // the codec-scope divergence is surfaced in the DDL: this engine
    // compresses whole fragment files (parquet-mr), the reference
    // compresses per-attribute column chunks [mytile.cc:550–576] —
    // the note must ride along whenever any codec is declared, and be
    // inert on replay (asserted by the schema equality below)
    assert(ddl.contains("graft.codec.scope' = 'file"),
      s"codec divergence note missing in:\n$ddl")
    // replay into a second catalog → identical stored schema
    val (cat2, wh2) = mkCat()
    spark.sql(ddl.replace(s"$cat.t", s"$cat2.t"))
    val a = GraftArray.store(spark, s"$wh/t").loadSchema()
    val b = GraftArray.store(spark, s"$wh2/t").loadSchema()
    assert(a == b)
  }

  test("the encryption key never leaks into DDL") {
    val (cat, _) = mkCat()
    spark.conf.set(graft.core.EncryptionKeys.ConfKey,
      "000102030405060708090a0b0c0d0e0f")
    spark.sql(s"""CREATE TABLE $cat.e (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k',
      |  'graft.encrypted'='true')""".stripMargin)
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.e")
      .collect().head.getString(0)
    assert(ddl.contains("graft.encrypted' = 'true"))
    assert(!ddl.contains("000102030405060708090a0b0c0d0e0f"))
  }
}
