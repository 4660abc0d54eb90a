package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import graft.sources.GraftArray

/** A `mock://`-scheme Hadoop filesystem backed by local disk — stands
  * in for s3a/abfs/gcs to prove FragmentStore and both scan paths are
  * scheme-generic (reference URI surface: s3://, azure://, gcs:// —
  * mytile-discovery.cc:590–603). Everything resolves through the
  * session Hadoop configuration, exactly as a real object-store
  * connector would. */
class MockObjectFs extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")
}

class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  test("array create/write/scan round-trips through a non-file scheme") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mock.impl", classOf[MockObjectFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft_obj").toString
    val uri = s"mock:$local/arr"
    val sch = ArraySchema(ArrayKind.Sparse,
      Seq(DimensionSpec("k", LongType)),
      Seq(AttributeSpec("v", DoubleType), AttributeSpec("s", StringType)))
    GraftArray.create(spark, uri, sch)
    assert(GraftArray.exists(spark, uri))
    GraftArray.write(spark, uri, spark.range(0, 200)
      .select(col("id").as("k"), (col("id") * 0.5).as("v"),
        concat(lit("x"), col("id")).as("s")))
    // convenience load (Spark parquet source via session conf)
    assert(GraftArray.load(spark, uri).count() == 200)
    // DSv2 scan: the vectorized columnar path opens files through the
    // session Hadoop configuration (GraftParquetReadShim), so it
    // engages on non-file schemes too — this is the path a real
    // s3a/abfs/gcs deployment scans through
    val df = spark.read.format("graftarray").option("path", uri).load()
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.supportsColumnar,
      "non-file scheme must still vectorize (conf-carrying reader)")
    assert(df.count() == 200)
    assert(df.filter(col("k") >= 100L && col("v") < 75.0).count() == 50)
    // aggregate pushdown from manifest stats is storage-agnostic
    val agg = df.agg(sum(col("v")).as("sv"))
    assert(agg.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(agg.as[Double].head() == (0 until 200).map(_ * 0.5).sum)
    // metadata + time travel ride the same FragmentStore
    GraftArray.putMetadata(spark, uri, Map("tier" -> "object"))
    assert(GraftArray.metadata(spark, uri).count() == 1)
  }
}
