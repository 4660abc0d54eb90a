package graft
import org.apache.spark.sql.SparkSession
/** Dev-only single-query timer: `runMain graft.BenchHot q1 q2 ...`
  * (defaults to the historical dedup hot set). */
object BenchHot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("d3_minhash_lsh", "v1_cosine_neardup", "d4_simhash_pairs",
        "t5_simhash", "d2_ngram_jaccard")
    for (q <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
