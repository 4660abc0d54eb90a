package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway stage timing for v5 (not committed).
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.load(s, d, "embeddings")
    // stage 1: banded pairs (includes the two localCheckpoints)
    val pairs = time("lshVerifiedPairs build+count") {
      val p = operators.Similarity.lshVerifiedPairs(e).select("i", "j")
      p.count(); p
    }
    time("connectedComponents") {
      operators.Dedup.connectedComponents(pairs).count()
    }
    time("v5 full query end-to-end") {
      SparkEntry.queries("v5_embedding_clusters")(s, d).count()
    }
    s.stop()
  }
}
