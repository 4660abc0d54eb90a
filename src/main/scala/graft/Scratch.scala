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
    // v21 cascade recall vs exact, per oversample width, both scales
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(s, d, "embeddings")
      for (c <- Seq(100, 200, 400, 800)) {
        val rec = operators.Similarity.cascadeRecalls(s, e, c)
        println(s"[scratch] $d cands=$c recalls=${rec.mkString(",")}")
      }
    }
    s.stop()
  }
}
