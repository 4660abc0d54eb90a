package graft

import org.apache.spark.sql.functions._

/** Training-pipeline operator properties the oracle can't express:
  * split leakage safety, packing parallelism, split determinism. */
class PipelineSpec extends SparkSpec {

  test("x4 cluster split never separates a near-dup pair") {
    val out = operators.Pipeline.queries("x4_cluster_split")(spark, sf)
      .cache()
    val mixedClusters = out.groupBy("cluster")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(mixedClusters == 0, "a cluster straddles splits")
    val pairs = operators.Dedup
      .minhashVerifiedPairs(Tables.load(spark, sf, "documents"), 0.8)
      .select("i", "j")
    val leaked = pairs
      .join(out.select(col("doc_id").as("i"), col("split").as("si")), "i")
      .join(out.select(col("doc_id").as("j"), col("split").as("sj")), "j")
      .filter(col("si") =!= col("sj")).count()
    assert(leaked == 0, "near-dup pair crosses the split boundary")
    out.unpersist()
  }

  test("x2 packing window is shard-partitioned, not a global sort") {
    val df = operators.Pipeline.queries("x2_seq_packing")(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.nonEmpty, "no window in plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "packing window must partition by shard (global sort is a 100 TB funnel)")
    // windows never lose or duplicate documents
    val nDocs = Tables.load(spark, sf, "documents").count()
    val packed = df.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(packed == nDocs, s"packing lost docs: $packed != $nDocs")
  }

  test("x1 split fractions track the md5 thresholds and are re-run stable") {
    val run1 = operators.Pipeline.queries("x1_hash_split")(spark, sf).collect()
    val run2 = operators.Pipeline.queries("x1_hash_split")(spark, sf).collect()
    assert(run1.toSeq == run2.toSeq, "split not deterministic across runs")
    val byName = run1.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byName.values.sum.toDouble
    val train = byName.getOrElse("train", 0L) / total
    assert(train > 0.70 && train < 0.90, s"train fraction off: $train")
    assert(byName.keySet == Set("train", "val", "test"))
  }

  test("x3 mixture rates scale with the source tier") {
    val rows = operators.Pipeline.queries("x3_mixture_sample")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tier rates 100% / 50% / 12.5%: high-tier sources must keep more
    val t0 = (0 until 5).map(i => rows.getOrElse(s"src$i", 0L)).sum
    val t2 = (10 until 20).map(i => rows.getOrElse(s"src$i", 0L)).sum
    assert(t0 > t2, s"tier-0 kept $t0 <= tier-2 kept $t2 despite 8x rate")
  }
}
