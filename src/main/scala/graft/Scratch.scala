package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway measurement harness (not part of any shipped path).
// Current experiment (round 11, post-fix): QUANTIFY the minhash
// identical-sequence collapse on a mega-cluster corpus — the re-crawl
// shape the round-10 verdict flagged. The collapsed path ships
// (Dedup.minhashVerifiedPairs); the per-doc shape is replayed inline
// for the head-to-head number recorded in SCALE.md.
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    // mega-cluster corpus: m byte-identical docs (one re-crawled page)
    // + u unique docs
    def corpus(m: Int, u: Int): DataFrame = {
      val hot = (1 to 80).map(i => s"tok$i").mkString(" ")
      val rows = (0 until m).map(i => (i.toLong, hot)) ++
        (0 until u).map(i => ((m + i).toLong,
          (1 to 40).map(j => s"u${i}w$j").mkString(" ")))
      rows.toDF("doc_id", "text").localCheckpoint()
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the pre-collapse per-doc shape (what shipped before round 11)
    def perDocPairs(df: DataFrame, threshold: Double): Long = {
      val sig = df.select(col("doc_id"),
        graft.functions.TextFunctions.minhashSignature(
          graft.functions.TextFunctions.shingles(col("text"), 5), 64)
          .as("sig")).localCheckpoint()
      val bands = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(15)), b =>
          concat_ws("_", b,
            element_at(col("sig"), b * 4 + 1),
            element_at(col("sig"), b * 4 + 2),
            element_at(col("sig"), b * 4 + 3),
            element_at(col("sig"), b * 4 + 4)))).as("band"))
      val cand = bands.as("a").join(bands.as("b"), "band")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .distinct()
      val sets = df.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 5).as("sh"))
        .localCheckpoint()
      cand
        .join(sets.select(col("doc_id").as("i"), col("sh").as("sa")), "i")
        .join(sets.select(col("doc_id").as("j"), col("sh").as("sb")), "j")
        .withColumn("jac",
          size(array_intersect(col("sa"), col("sb"))).cast("double") /
            size(array_union(col("sa"), col("sb"))).cast("double"))
        .filter(col("jac") >= threshold)
        .count()
    }

    for (m <- Seq(500, 2000, 5000, 10000)) {
      val df = corpus(m, 500)
      val (nNew, tNew) = time(
        operators.Dedup.minhashVerifiedPairs(df, 0.8).count())
      val want = m.toLong * (m - 1) / 2
      val old =
        if (m <= 5000) {
          val (nOld, tOld) = time(perDocPairs(df, 0.8))
          f"per-doc $tOld%7.1f s (n=$nOld)"
        } else "per-doc skipped (quadratic band join)"
      println(f"[scratch] m=$m%6d clones: collapsed $tNew%6.1f s " +
        f"(n=$nNew, want=$want)  |  $old")
    }
    s.stop()
  }
}
