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
    // v19 filtered-ANN recall vs exact filtered brute force, per nprobe
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(s, d, "embeddings")
      val (uri, cents) = operators.Similarity.annArrayFilteredBuild(s, d, e)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val exact = operators.Similarity.topkSelect(
        e.filter(col("label") === 2).select(col("vec_id"), col("embedding"))
          .join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            graft.functions.VectorFunctions
              .cosine(col("qv"), col("embedding"))), 10)
        .select("query_id", "vec_id")
      for (np <- Seq(4, 6, 8)) {
        val ap = operators.Similarity.annArrayProbeScore(
          s, uri, cents, e, 10, nprobe = np, extra = col("label") === 2)
        val rec = exact.join(
            ap.select(col("query_id"), col("vec_id")).withColumn("h", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy("query_id")
          .agg((sum(coalesce(col("h"), lit(0))) / count(lit(1))).as("r"))
          .orderBy("query_id").collect().map(_.getDouble(1))
        println(s"[scratch] $d nprobe=$np recalls=${rec.mkString(",")}")
      }
    }
    s.stop()
  }
}
