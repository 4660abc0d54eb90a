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

  test("x5 approx profile: one pass, distinct counts within tolerance") {
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
    val cols = Seq("l_orderkey", "l_returnflag", "l_shipdate")
    val exact = operators.Pipeline.profile(li, cols, approx = false)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = operators.Pipeline.profile(li, cols)
    val rows = approx.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == cols.toSet)
    cols.foreach { c =>
      val (e, a) = (exact(c), rows(c))
      assert(a.getLong(1) == e.getLong(1)) // n exact
      assert(a.getLong(2) == e.getLong(2)) // n_null exact
      assert(a.getString(4) == e.getString(4) &&
        a.getString(5) == e.getString(5)) // min/max exact
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed < 0.05,
        s"$c approx distinct $ad vs exact $ed") // HLL++ rsd=0.01
    }
    // ONE aggregation pass: exactly one aggregation shuffle in the
    // plan (the trailing 3-row orderBy's rangepartitioning exchange
    // doesn't count), versus one per column for the exact variant
    def aggExchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.linesIterator
        .takeWhile(!_.contains("Initial Plan")) // AQE prints both plans
        .count(l => l.contains("Exchange") && !l.contains("rangepartitioning"))
    assert(aggExchanges(approx) == 1,
      s"approx profile should be single-pass, saw ${aggExchanges(approx)}")
    assert(aggExchanges(
      operators.Pipeline.profile(li, cols, approx = false)) > 1)
  }
}
