package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF coarse quantization for ANN, entirely as DataFrame plans:
  *
  *  - deterministic init: centroids = the k vectors with the smallest
  *    ids (seedless, stable across runs — `Date.now`-free by design)
  *  - Lloyd iterations: assign (cross join vs broadcast centroids,
  *    argmin distance) → recompute means (`posexplode` + groupBy)
  *  - search: probe the `nprobe` centroids nearest to the query and
  *    scan only their inverted lists
  *
  * At 100 TB the corpus side stays partitioned by cluster (the
  * inverted lists ARE the partitioning), centroids stay broadcast —
  * no shuffle on the scan path.
  */
object Ivf {

  /** Corpus + `cluster` column. */
  def assign(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    // deterministic init: the k lowest-id vectors become centroids
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
      .select(col("cid"), col("embedding").as("cv"))

    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assignOnce(corpus, centroids)
      // recompute means per cluster; keep float element type
      centroids = assigned
        .select(col("cluster").as("cid"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pairs"))
        .select(col("cid"),
          expr("transform(pairs, p -> cast(p.m as float))").as("cv"))
    }
    assignOnce(corpus, centroids)
  }

  private def assignOnce(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim", dot(col("embedding"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "sim")
      .withColumnRenamed("cid", "cluster")
      .drop("cv")
  }

  /** For each query row (query_id, qv, cluster), the corpus rows in its
    * `nprobe` nearest clusters. */
  def probes(queries: DataFrame, assigned: DataFrame, nprobe: Int): DataFrame = {
    val centroids = assigned
      .select(col("cluster").as("cid"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
      .select(col("cid"),
        expr("transform(pairs, p -> cast(p.m as float))").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cid"))
    val probeSet = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", dot(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(w))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("probe_cluster"))
    probeSet.join(assigned,
      col("probe_cluster") === assigned("cluster"))
  }
}
