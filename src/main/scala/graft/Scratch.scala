package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway measurement harness (not part of any shipped path).
// Current experiment (round 12): QUANTIFY the identical-key collapse
// rework — the round-11 form computed gid with min() OVER
// (PARTITION BY sh), funnelling a mega-cluster of m identical docs
// through ONE window task; the shipped round-12 form
// (Dedup.collapseIdenticalKeys) is groupBy(128-bit fingerprint)
// .agg(min) + join-back. Head-to-head at m = 1e4 / 1e5 / 1e6 measures
// the COLLAPSE stage (members materialized + reps counted): the pair
// expansion after it is Θ(m²) OUTPUT by construction and identical in
// both forms, so it is excluded from both sides.
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // mega-cluster corpus: m byte-identical docs (one re-crawled page)
    // + u unique docs; generated distributed (never a driver-side Seq)
    def corpus(m: Long, u: Long): DataFrame = {
      val hot = (1 to 80).map(i => s"tok$i").mkString(" ")
      val hotDf = s.range(m).select(col("id").as("doc_id"),
        lit(hot).as("text"))
      val uniq = s.range(u).select((col("id") + m).as("doc_id"),
        concat_ws(" ", (1 to 40).map(j =>
          concat(lit("u"), col("id"), lit(s"w$j"))): _*).as("text"))
      hotDf.unionByName(uniq).repartition(32).localCheckpoint()
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the round-11 window-based collapse, replayed inline
    def windowMembers(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 5).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("gid", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("sh")))

    def repCount(members: DataFrame): Long =
      members.filter(col("doc_id") === col("gid")).count()

    // JIT warm-up so m=1e4 isn't first-in-JVM
    repCount(operators.Dedup.minhashMembers(corpus(1000L, 100L))
      .localCheckpoint())
    for (m <- Seq(10000L, 100000L, 1000000L)) {
      val df = corpus(m, 500L)
      val (nNew, tNew) = time(
        repCount(operators.Dedup.minhashMembers(df).localCheckpoint()))
      val (nOld, tOld) = time(repCount(windowMembers(df)
        .localCheckpoint()))
      println(f"[scratch] m=$m%8d clones: groupBy-collapse $tNew%6.1f s " +
        f"(reps=$nNew, want=${501L})  |  window $tOld%7.1f s (reps=$nOld)")
    }
    s.stop()
  }
}
