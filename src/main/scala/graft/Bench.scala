package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed loop (driver measures
    // steady-state query cost, not classloading)
    try SparkEntry.queries.get("a3_groupby_q1")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // min-of-N per query: single-run timings at the 0.2–1.5 s scale are
    // dominated by JIT/GC noise (round-2 "regressions" were all
    // plan-identical noise); the minimum is the stable cost estimate
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          (ok, (System.nanoTime() - t0) / 1e9)
        }
        // only successful runs count — a failed iteration must not
        // masquerade as a fast one
        val good = times.filter(_._1).map(_._2)
        name -> (if (good.nonEmpty) good.min else times.map(_._2).max)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout captures have truncated the single line mid-record in past
    // rounds; persist the complete per-query artifact alongside it
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
