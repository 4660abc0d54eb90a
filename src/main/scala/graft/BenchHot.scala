package graft
import org.apache.spark.sql.SparkSession
/** Dev-only single-query timer: `runMain graft.BenchHot q1 q2 ...`
  * (defaults to the historical dedup hot set). Honors
  * `SPARK_GRAFT_CPUS` and `SPARK_GRAFT_SF_DIR` like the real bench so
  * the same command measures core-count scaling (the round-13 sf≥1
  * spot-bench runs it at 8 and 32 cores). */
object BenchHot {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
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
