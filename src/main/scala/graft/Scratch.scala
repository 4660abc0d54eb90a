package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway measurement harness (not part of any shipped path).
// Current experiment (round 11, verdict ask #5): corpus-TIGHTNESS
// measurement — mean cosine of each vector to its assigned centroid —
// on the isotropic embeddings tables vs the blob-clustered fixtures,
// plus the dial cells SCALE.md's table left unmeasured (filtered
// recall at nprobe=2/4 in the tight regime), so the auto-dial
// thresholds derive from numbers, not guesses.
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def blobs(n: Int, sigma: Double): DataFrame = {
      val rnd = new scala.util.Random(42)
      val centers = Array.fill(16) {
        val c = Array.fill(64)(rnd.nextGaussian())
        val nn = math.sqrt(c.map(x => x * x).sum)
        c.map(x => (x / nn).toFloat)
      }
      val rows = (0 until n).map { i =>
        val c = centers(i % 16)
        val v = c.map(x => (x + sigma * rnd.nextGaussian()).toFloat)
        (i.toLong, v.toSeq, i % 10)
      }
      rows.toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .localCheckpoint()
    }

    def cosineCol = graft.functions.VectorFunctions.cosine _

    def filteredRecalls(e: DataFrame, assigned: DataFrame,
        centroids: Array[Array[Float]], np: Int): Array[Double] = {
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val approx = operators.Similarity.topkSelect(
        operators.Ivf.probes(q, assigned, centroids, nprobe = np)
          .filter(col("vec_id") =!= col("query_id") && col("label") === 2)
          .withColumn("cos", cosineCol(col("qv"), col("embedding"))), 10)
      val exact = operators.Similarity.topkSelect(
        e.filter(col("label") === 2).select(col("vec_id"), col("embedding"))
          .join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos", cosineCol(col("qv"), col("embedding"))), 10)
      exact.select("query_id", "vec_id")
        .join(approx.select(col("query_id"), col("vec_id"))
          .withColumn("h", lit(1)), Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("h"), lit(0))) / count(lit(1))).as("r"))
        .orderBy("query_id").collect().map(_.getDouble(1))
    }

    val corpora: Seq[(String, DataFrame)] = Seq(
      "isotropic-sf0.01" -> Tables.load(s, "/root/testdata/sf0.01",
        "embeddings"),
      "isotropic-sf0.1" -> Tables.load(s, "/root/testdata/sf0.1",
        "embeddings"),
      "blob-s0.10-n500" -> blobs(500, 0.10),
      "blob-s0.10-n2000" -> blobs(2000, 0.10),
      "blob-s0.05-n500" -> blobs(500, 0.05),
      "blob-s0.05-n2000" -> blobs(2000, 0.05))

    corpora.foreach { case (tag, e0) =>
      val e = e0.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        (col("vec_id") % 10).as("label")).localCheckpoint()
      val (assigned0, centroids) = operators.Ivf.fit(e, k = 16, iters = 3)
      val assigned = assigned0.localCheckpoint()
      val t = operators.Similarity.corpusTightness(assigned, centroids)
      // anchor-based proxy (v21's training-free variant): nearest of
      // the 16 lowest-id vectors instead of fitted centroids
      val anchors = e.orderBy("vec_id").limit(16)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray)
      val ta = operators.Similarity.corpusTightness(
        e.withColumn("cluster",
          graft.functions.expressions.TopK.argMaxDot(
            col("embedding"), anchors)), anchors)
      println(f"[scratch] $tag%-18s tightness(fit)=$t%.3f tightness(anchor)=$ta%.3f")
      for (np <- Seq(2, 4, 8)) {
        val r = filteredRecalls(e, assigned, centroids, np)
        println(f"[scratch]   filtered nprobe=$np%2d min=${r.min}%.2f med=${r.sorted.apply(r.length / 2)}%.2f")
      }
    }
    s.stop()
  }
}
