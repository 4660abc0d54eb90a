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
    // v24 probe sweep: hits@10 (of 50) per nprobe, both scales
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(s, d, "embeddings")
      val hits = operators.Similarity.probeSweepHits(s, e)
      println(s"[scratch] $d nprobe->hits = ${hits.mkString(",")}")
    }
    s.stop()
  }
}
