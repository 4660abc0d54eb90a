package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway measurement harness (not part of any shipped path).
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val path = s"$d/events.parquet"
    val ev = s.read.parquet(path).transform(Tables.normalizeTs)
    val staged = graft.core.TempDirs.fresh("graft_sc15")
    ev.filter(pmod(col("event_id"), lit(5L)) =!= 0)
      .coalesce(1).write.parquet(s"$staged/batch0")
    val hourUs = 3600L * 1000000
    val fullMaxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    // batch1: an ADVANCER row just past the corpus max, so the
    // watermark is applied before the late slice arrives
    ev.limit(1).select(
      lit(-9L).as("event_id"),
      timestamp_micros(lit(fullMaxUs + 60L * 1000000)).as("ts"),
      lit(-1L).as("user_id"), lit("advancer").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$staged/batch1")
    ev.filter(pmod(col("event_id"), lit(5L)) === 0)
      .coalesce(1).write.parquet(s"$staged/batch2")
    Seq(1, 2).foreach { i =>
      val tsUs = fullMaxUs + 2 * hourUs + i * 1200L * 1000000
      val aligned = tsUs / hourUs * hourUs + (i - 1) * 60L * 1000000
      ev.limit(1).select(
        lit(-i.toLong).as("event_id"),
        timestamp_micros(lit(aligned)).as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$staged/batch${i + 2}")
    }
    val schema = s.read.parquet(s"$staged/batch0").schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(staged)
    val q = graft.streaming.EventPipeline.windowedCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sc15").start()
    try q.processAllAvailable() finally q.stop()
    q.recentProgress.foreach { p =>
      println(s"[scratch] batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).sum}")
    }
    s.stop()
  }
}
