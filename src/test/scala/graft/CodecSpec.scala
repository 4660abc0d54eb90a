package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import graft.sources.GraftArray
import scala.jdk.CollectionConverters._

/** Compression-codec surface (reference per-attribute filter lists —
  * ha_mytile.cc:1353–1378; t/filters.test): `graft.codec[.col]` is
  * persisted in the manifest, surfaced on discovery, and honored by
  * both fragment writers at the file level (parquet-mr's writer API
  * has no per-column-chunk codec — heterogeneous declarations fall
  * back to the table default; a documented divergence). */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def footerCodecs(uri: String): Set[String] = {
    val fs = new Path(uri).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(new Path(uri), true)
    val out = scala.collection.mutable.Set[String]()
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          f.getPath, spark.sparkContext.hadoopConfiguration))
        try r.getFooter.getBlocks.asScala.foreach(b =>
          b.getColumns.asScala.foreach(c => out += c.getCodec.toString))
        finally r.close()
      }
    }
    out.toSet
  }

  test("table codec round-trips through both write paths") {
    val wh = java.nio.file.Files.createTempDirectory("graft_codec").toString
    spark.conf.set("spark.sql.catalog.gc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc.warehouse", wh)
    spark.sql(
      """CREATE TABLE gc.z (k BIGINT, v DOUBLE, s STRING)
        |TBLPROPERTIES('graft.dimensions'='k', 'graft.codec'='ZSTD')""".stripMargin)
    // DSv2 writer path
    spark.sql("INSERT INTO gc.z VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    assert(footerCodecs(s"$wh/z") == Set("ZSTD"))
    // convenience writer path (Spark parquet writer)
    GraftArray.write(spark, s"$wh/z",
      Seq((3L, 3.5, "c")).toDF("k", "v", "s"))
    assert(footerCodecs(s"$wh/z") == Set("ZSTD"))
    // data still reads back through both paths
    assert(spark.table("gc.z").count() == 3)
    assert(GraftArray.load(spark, s"$wh/z").count() == 3)
    // manifest round-trip survives reload
    assert(GraftArray.store(spark, s"$wh/z").loadSchema().codec
      .contains("ZSTD"))
  }

  test("NONE disables compression; default stays SNAPPY") {
    val wh = java.nio.file.Files.createTempDirectory("graft_codec2").toString
    spark.conf.set("spark.sql.catalog.gc2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc2.warehouse", wh)
    spark.sql(
      """CREATE TABLE gc2.n (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('graft.dimensions'='k', 'graft.codec'='NONE')""".stripMargin)
    spark.sql("INSERT INTO gc2.n VALUES (1, 1.5)")
    assert(footerCodecs(s"$wh/n") == Set("UNCOMPRESSED"))
    spark.sql(
      """CREATE TABLE gc2.d (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    spark.sql("INSERT INTO gc2.d VALUES (1, 1.5)")
    assert(footerCodecs(s"$wh/d") == Set("SNAPPY"))
  }

  test("per-attribute codec declarations surface and resolve") {
    val wh = java.nio.file.Files.createTempDirectory("graft_codec3").toString
    spark.conf.set("spark.sql.catalog.gc3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc3.warehouse", wh)
    // homogeneous per-attribute declarations are honored physically
    spark.sql(
      """CREATE TABLE gc3.h (k BIGINT, a DOUBLE, b STRING)
        |TBLPROPERTIES('graft.dimensions'='k',
        |  'graft.codec.a'='GZIP', 'graft.codec.b'='GZIP')""".stripMargin)
    spark.sql("INSERT INTO gc3.h VALUES (1, 1.5, 'x')")
    assert(footerCodecs(s"$wh/h") == Set("GZIP"))
    // declarations surface in read-side column metadata (discovery)
    val meta = spark.table("gc3.h").schema.fields
      .map(f => f.name -> f.metadata).toMap
    assert(meta("a").getString("graft.codec") == "GZIP")
    assert(meta("b").getString("graft.codec") == "GZIP")
    // heterogeneous declarations persist but the file falls back to
    // the table default (parquet-mr writes one codec per file)
    spark.sql(
      """CREATE TABLE gc3.x (k BIGINT, a DOUBLE, b STRING)
        |TBLPROPERTIES('graft.dimensions'='k',
        |  'graft.codec.a'='GZIP', 'graft.codec.b'='ZSTD')""".stripMargin)
    spark.sql("INSERT INTO gc3.x VALUES (1, 1.5, 'x')")
    assert(footerCodecs(s"$wh/x") == Set("SNAPPY"))
    val sch = GraftArray.store(spark, s"$wh/x").loadSchema()
    assert(sch.attrs.find(_.name == "a").flatMap(_.codec).contains("GZIP"))
    assert(sch.attrs.find(_.name == "b").flatMap(_.codec).contains("ZSTD"))
    // unknown codec is rejected at DDL time
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE gc3.bad (k BIGINT, a DOUBLE)
          |TBLPROPERTIES('graft.dimensions'='k',
          |  'graft.codec'='LZMA')""".stripMargin)
    }
    assert(e.getMessage.contains("unsupported codec") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported codec")))
  }
}
