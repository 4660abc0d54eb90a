package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._

/** IVF coarse quantization for ANN:
  *
  *  - deterministic init: centroids = the k lowest-id vectors
  *    (seedless, stable — `Date.now`-free by design)
  *  - Lloyd iterations: assign against BROADCAST centroids (argmin via
  *    window), recompute means, then COLLECT the k×dim centroid table
  *    to the driver — k·dim floats, kilobytes — so each iteration's
  *    lineage is cut and nothing is recursively recomputed
  *  - search: probe the `nprobe` centroids nearest to the query and
  *    scan only their inverted lists
  *
  * At 100 TB the corpus stays partitioned by cluster (the inverted
  * lists ARE the partitioning); centroids are always driver-side tiny.
  */
object Ivf {

  private val centroidSchema = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cv", ArrayType(FloatType, containsNull = false))))

  /** Corpus + `cluster` column, plus the final centroid table. */
  def fit(corpus: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    // deterministic init: the k lowest-id vectors
    var centroids: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(
        corpus.orderBy("vec_id").limit(k)
          .select(col("embedding").cast("array<float>"))
          .collect().zipWithIndex
          .map { case (r, i) => Row(i, r.getSeq[Float](0)) }.toSeq, 2),
      centroidSchema)

    for (_ <- 0 until iters) {
      val assigned = assignOnce(corpus, centroids)
      val means = assigned
        .select(col("cluster").as("cid"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("cid"),
          expr("transform(pairs, p -> cast(p.m as float))").as("cv"))
        .collect() // k rows — cuts the lineage
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(means.toSeq, 2), centroidSchema)
    }
    (assignOnce(corpus, centroids), centroids)
  }

  private def assignOnce(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim", dot(col("embedding"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "sim", "cv")
      .withColumnRenamed("cid", "cluster")
  }

  /** For each query row (query_id, qv, cluster), the corpus rows in its
    * `nprobe` nearest clusters. */
  def probes(queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
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
