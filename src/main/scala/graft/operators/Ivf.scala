package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.expressions.TopK

/** IVF coarse quantization for ANN:
  *
  *  - deterministic init: centroids = the k lowest-id vectors
  *    (seedless, stable — `Date.now`-free by design)
  *  - Lloyd iterations: assignment is a single codegen'd argmax-dot
  *    against the driver-side centroid table ([[TopK.argMaxDot]]) —
  *    zero row inflation, zero exchange (the round-1
  *    crossJoin(centroids)+window plan materialized n×k rows and
  *    shuffled them); per-cluster means reduce map-side (hash partial
  *    agg) so the exchange moves k×dim aggregates, then the k×dim
  *    float centroid table is collected — kilobytes, and the collect
  *    cuts each iteration's lineage so nothing recomputes recursively
  *  - search: probe the `nprobe` centroids nearest to the query and
  *    scan only their inverted lists
  *
  * At 100 TB the corpus stays partitioned by cluster (the inverted
  * lists ARE the partitioning); centroids are always driver-side tiny.
  */
object Ivf {

  /** Corpus + `cluster` column, plus the final centroid table
    * (driver-side k×dim floats — kilobytes). */
  def fit(corpus: DataFrame, k: Int, iters: Int)
      : (DataFrame, Array[Array[Float]]) = {
    // deterministic init: the k lowest-id vectors
    var centroids: Array[Array[Float]] =
      corpus.orderBy("vec_id").limit(k)
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)

    val dim = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      // per-cluster mean via ONE vector-sum aggregate over the
      // un-inflated corpus: partial states are k×(dim+1) doubles per
      // map partition, one exchange per iteration, k result rows. The
      // former posexplode form generated corpus×dim rows before the
      // partial agg and paid a SECOND shuffle (groupBy(cid)
      // collect_list) just to reassemble the vector it had exploded;
      // the dim-separate avg-column form fixed the dataflow but paid
      // Catalyst analysis per column per iteration (measured: v11's
      // six fits +1.3 s).
      val means = assignOnce(corpus, centroids)
        .groupBy(col("cluster").as("cid"))
        .agg(TopK.vecSumCount(col("embedding"), dim).as("sc"))
        .collect() // ≤ k rows — cuts the lineage
      val next = centroids.map(_.clone())
      // clusters that lost every member keep their previous centroid
      means.foreach { r =>
        val sc = r.getSeq[Double](1)
        val n = sc(dim)
        if (n > 0)
          next(r.getInt(0)) = Array.tabulate(dim)(i => (sc(i) / n).toFloat)
      }
      centroids = next
    }
    (assignOnce(corpus, centroids), centroids)
  }

  /** One assignment pass: cluster = argmax over centroids of the dot
    * product, computed per-row inside WholeStageCodegen (ties → lowest
    * centroid id, matching `ORDER BY sim DESC, cid ASC`). */
  private def assignOnce(corpus: DataFrame,
      centroids: Array[Array[Float]]): DataFrame =
    corpus.withColumn("cluster", TopK.argMaxDot(col("embedding"), centroids))

  /** For each query row (query_id, qv), the corpus rows in its `nprobe`
    * nearest clusters. The probe list is computed per query row by the
    * same kernel (no crossJoin/window); the tiny query×probe table is
    * broadcast against the partitioned corpus. */
  def probes(queries: DataFrame, assigned: DataFrame,
      centroids: Array[Array[Float]], nprobe: Int): DataFrame = {
    val probeSet = queries
      .withColumn("probe_cluster",
        explode(TopK.argTopDot(col("qv"), centroids, nprobe)))
      .select(col("query_id"), col("qv"), col("probe_cluster"))
    assigned.join(broadcast(probeSet),
      col("probe_cluster") === assigned("cluster"))
  }
}
