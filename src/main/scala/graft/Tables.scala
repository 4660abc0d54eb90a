package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated TPC-H-ish test data
  * (TESTDATA.md). Every `SparkEntry.queries` entry resolves its inputs
  * through here so filters/projections reach the parquet scan untouched.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); Spark reads it only as a
    // nanos long (spark.sql.legacy.parquet.nanosAsLong). Normalize to
    // TimestampType µs (floor toward -inf matches DuckDB ns→µs trunc
    // for the positive epochs in the test data).
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // integer DIV, not `/` — long/long promotes to double and the
        // 2024 ns epochs exceed double's 53-bit mantissa (off-by-1 µs).
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case None => df
    }
  }

  /** Register all tables as temp views so `spark.sql` sees the same names
    * as the DuckDB oracle. Cheap (lazy scans) and idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
