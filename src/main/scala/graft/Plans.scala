package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: `runMain graft.Plans <tag> q1 q2 ...` writes
  * `plans/$GRAFT_PLANS_DIR/<q>_<tag>.txt` (default plans/r13) with the
  * formatted physical plan of each named declared query
  * (bench-identical session confs). */
object Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val qs = args.tail.toSeq
    val outDir = sys.env.getOrElse("GRAFT_PLANS_DIR", "r13")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"plans/$outDir"))
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, d)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/$outDir/${q}_$tag.txt"),
        p.getBytes("UTF-8"))
      println(s"[plans] wrote ${q}_$tag.txt (${p.length} chars)")
    }
    spark.stop()
  }
}
