package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway measurement harness (not part of any shipped path).
// Current experiment: sq5 recursive-CTE per-level floor — baseline vs
// coalesce(1) chain vs broadcast-hinted recursion leg.
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    def chainDf = Tables.load(s, d, "orders").filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
    def sql(view: String, hint: String) =
      s"""WITH RECURSIVE walk(o_custkey, o_orderkey, hop, cum) AS (
          SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT), o_totalprice
          FROM $view WHERE rk = 1
          UNION ALL
          SELECT $hint n.o_custkey, n.o_orderkey, w.hop + 1,
            w.cum + n.o_totalprice
          FROM walk w JOIN $view n
            ON n.o_custkey = w.o_custkey AND n.rk = w.hop + 1)
        SELECT o_custkey, o_orderkey, hop, round(cum, 2) AS cum_price
        FROM walk ORDER BY o_custkey, hop"""
    def time(label: String)(body: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[scratch] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    chainDf.localCheckpoint().createOrReplaceTempView("c_base")
    time("baseline (32-part checkpoint)") { s.sql(sql("c_base", "")).count() }
    chainDf.coalesce(1).localCheckpoint().createOrReplaceTempView("c_one")
    time("coalesce(1) checkpoint") { s.sql(sql("c_one", "")).count() }
    time("broadcast-hint leg") {
      s.sql(sql("c_base", "/*+ BROADCAST(n) */")).count() }
    time("coalesce1 + bcast") {
      s.sql(sql("c_one", "/*+ BROADCAST(n) */")).count() }
    // shuffle.partitions=1 via session clone
    val s1 = s.newSession()
    s1.conf.set("spark.sql.shuffle.partitions", "1")
    chainDf.localCheckpoint().createOrReplaceTempView("c_s1")
    // view registered on root; re-register on s1
    Tables.load(s1, d, "orders").filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .coalesce(1).localCheckpoint().createOrReplaceTempView("c_s1v")
    time("1-shuffle-part session") { s1.sql(sql("c_s1v", "")).count() }
    s.stop()
  }
}
