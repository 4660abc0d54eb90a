package graft

import org.apache.spark.sql.functions._

/** Training-pipeline operator properties the oracle can't express:
  * split leakage safety, packing parallelism, split determinism. */
class PipelineSpec extends SparkSpec {

  test("x30 split leakage: fixture fires, eval splits complete, bounds hold") {
    val rows = SparkEntry.queries("x30_split_leakage")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "val"))
    rows.foreach { r =>
      val (nd, nl, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nl >= 0 && nl <= nd)
      assert(bp == nl * 10000 / nd)
    }
    // the duplicated-document fixture guarantees leakage at every sf
    assert(rows.map(_.getLong(2)).sum > 0, "no leakage detected — fixture dead")
  }

  test("x31 epoch plan: tail source hits the 4-epoch ceiling, budget conserved") {
    val rows = SparkEntry.queries("x31_epoch_plan")(spark, sf).collect()
    val budget = rows.map(r => r.getLong(2) + r.getLong(4)).distinct
    assert(budget.length == 1, s"per-source budget not constant: $budget")
    val (tail, real) = rows.partition(_.getString(0) == "src_tail")
    assert(tail.length == 1)
    assert(tail.head.getLong(3) == 40000L, "tail source must cap at 4 epochs")
    assert(tail.head.getLong(4) > 0L, "capped source must publish a deficit")
    real.foreach { r =>
      assert(r.getLong(4) == 0L, s"uncapped source with deficit: $r")
      assert(r.getLong(3) < 40000L)
      assert(r.getLong(2) == budget.head)
    }
  }

  test("x33 chunk surgery: statuses consistent, kept docs shed bad chunks") {
    import graft.functions.TextFunctions.qualityScore
    val rows = SparkEntry.queries("x33_chunk_filter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._4 <= r._2 * 64)
      val expect = if (r._3 == 0) "drop"
        else if (r._3 == r._2) "full" else "partial"
      assert(r._5 == expect, s"status mismatch: $r")
    }
    assert(Set("drop", "full", "partial").subsetOf(rows.map(_._5).toSet),
      s"a status branch is dead: ${rows.groupBy(_._5).keySet}")
    // the live surgery branch on THIS corpus (measured at all three
    // scales): docs the doc-level cut KEEPS wholesale still shed bad
    // chunks — partial docs with doc quality >= 0.5. (The converse
    // recovery branch — good chunks inside dropped docs — is
    // structurally dead here: low-q docs are short single-chunk docs
    // or uniformly low, measured recovered = 0 at every sf.)
    val docQ = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), round(qualityScore(col("text")), 4).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val trimmed = rows.filter(r => docQ(r._1) >= 0.5 && r._5 == "partial")
    assert(trimmed.nonEmpty, "no kept doc sheds a bad chunk — surgery inert")
  }

  test("x32 ablation: unique <= total per rule, redundancy detectable") {
    val rows = SparkEntry.queries("x32_filter_ablation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("len", "quality", "stop", "wordlen"))
    rows.foreach { r =>
      assert(r._3 <= r._2, s"unique > total: $r")
      assert((r._3 == 0) == (r._4 == 0L), s"tokens_only inconsistent: $r")
    }
    // every rule rejects something on this corpus...
    assert(rows.forall(_._2 > 0), s"dead rule: $rows")
    // ...and the unique-failure branch is live for at least one rule
    assert(rows.exists(_._3 > 0), "no rule has unique failures")
    // the ablation INSIGHT the op exists for: quality is fully
    // dominated here (its length term makes every quality-fail also a
    // len-fail) — unique failures 0, redundancy made visible
    assert(rows.find(_._1 == "quality").get._3 == 0L)
  }

  test("x17 keeps exactly the greedy quality-prefix under the budget") {
    val out = SparkEntry.queries("x17_token_budget")(spark, sf).collect()
    val budget = out.map(_.getLong(2)).sum * 3 / 10
    val keptTok = out.filter(_.getBoolean(3)).map(_.getLong(2)).sum
    assert(keptTok <= budget, s"budget exceeded: $keptTok > $budget")
    // prefix property in (quality desc, doc_id asc) order: kept is a
    // contiguous prefix, and the first dropped doc would overflow
    val sorted = out.sortBy(r => (-r.getDouble(1), r.getLong(0)))
    val firstDrop = sorted.indexWhere(!_.getBoolean(3))
    if (firstDrop >= 0) {
      assert(sorted.take(firstDrop).forall(_.getBoolean(3)))
      // positive token counts make the cumsum monotone, so the kept
      // set must be CONTIGUOUS — nothing after the first drop survives
      assert(sorted.drop(firstDrop).forall(!_.getBoolean(3)))
      assert(keptTok + sorted(firstDrop).getLong(2) > budget,
        "first dropped doc would have fit — not a maximal prefix")
    }
  }

  test("x17 core: saturated level + multi-shard boundary == cumsum replay") {
    import spark.implicits._
    def replay(rows: Seq[(Long, Double, Long)], b: Long): Map[Long, Boolean] = {
      var cum = 0L
      rows.sortBy(r => (-r._2, r._1)).map { case (id, _, t) =>
        cum += t; id -> (cum <= b)
      }.toMap
    }
    def run(rows: Seq[(Long, Double, Long)], b: Long): Map[Long, Boolean] =
      operators.Pipeline.tokenBudgetSelect(
        rows.toDF("doc_id", "quality", "n_tokens"), b)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

    // 30k docs across 3 doc_id shards (0/1/2), ALL one quality level — the
    // boundary is the whole corpus and the sharded two-level prefix
    // must stitch shard offsets exactly (the fixed corpus never
    // crosses a shard: ids 0..499)
    val flat = (0L until 30000L).map(i => (i, 0.5, i % 7 + 1))
    val half = flat.map(_._3).sum / 2
    assert(run(flat, half) == replay(flat, half))
    // boundary inside the SECOND of two levels, still multi-shard
    val two = (0L until 30000L).map(i =>
      (i, if (i % 3 == 0) 0.9 else 0.5, i % 7 + 1))
    val b2 = (two.map(_._3).sum * 2) / 3
    assert(run(two, b2) == replay(two, b2))
    // degenerate budgets: zero (nothing fits) and total (None branch)
    assert(run(flat.take(100), 0L).values.forall(!_))
    val total = flat.take(100).map(_._3).sum
    assert(run(flat.take(100), total).values.forall(identity))
    assert(run(flat.take(100), total - 1) == replay(flat.take(100), total - 1))
  }

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

  test("x6 decontamination: broadcast eval side, matches direct shingle intersect") {
    import graft.functions.TextFunctions.shingles
    val out = operators.Pipeline.queries("x6_decontaminate")(spark, sf)
    // eval side must reach the corpus as a broadcast (no corpus shuffle
    // for the join itself)
    assert(out.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan"))
      .exists(_.contains("BroadcastHashJoin")),
      "eval shingle set should broadcast-join the corpus side")
    val rows = out.collect()
    assert(rows.forall(_.getLong(0) >= 20), "eval docs must not appear")
    // recompute a handful of docs by direct shingle-set intersection
    val dd = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), shingles(col("text"), 5).as("sh"))
    val evSet = dd.filter(col("doc_id") < 20)
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val sample = dd.filter(col("doc_id").isin(20L, 21L, 137L, 499L))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).count(evSet.contains).toLong).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (id, n) =>
      assert(got(id) == n, s"doc $id overlap ${got(id)} != $n")
      assert(rows.find(_.getLong(0) == id).get.getBoolean(2) == (n > 0))
    }
  }

  test("x11 span removal cuts matched windows with margin, merges overlaps") {
    import spark.implicits._
    // eval doc 0 contributes shingles; corpus doc 100 contains one
    // eval 5-gram at tokens 11..15 (1-based); doc 101 contains two
    // overlapping hits; doc 102 is fully contaminated; doc 103 clean
    val evalText = "alpha beta gamma delta epsilon zeta eta"
    val hit = "alpha beta gamma delta epsilon" // 5-gram from eval
    val pre = (1 to 10).map(i => s"p$i").mkString(" ")
    val post = (1 to 10).map(i => s"q$i").mkString(" ")
    val df = Seq(
      (0L, evalText),
      (100L, s"$pre $hit $post"),
      // hits at pos 13 and 14 → intervals [11,20) and [12,21) merge
      (101L, s"$pre alpha beta alpha beta gamma delta epsilon zeta $post"),
      (102L, hit),
      (103L, "nothing shared with the eval suite here at all")
    ).toDF("doc_id", "text")
    val out = operators.Pipeline.decontamClean(df).collect()
      .groupBy(_.getLong(0))
    // doc 100: 25 tokens, hit at pos 11 → removed [9, 18) → segments
    // [1,9) and [18,26)
    val s100 = out(100L).map(r =>
      (r.getLong(2), r.getLong(3), r.getString(4)))
    assert(s100.toSeq == Seq(
      (1L, 8L, (1 to 8).map(i => s"p$i").mkString(" ")),
      (18L, 8L, (3 to 10).map(i => s"q$i").mkString(" "))),
      s"got ${s100.mkString(";")}")
    // doc 101: overlapping hits merge into ONE removed interval
    // [11, 21) → segments [1,11) and [21,29)
    val s101 = out(101L).map(r => (r.getLong(2), r.getLong(3)))
    assert(s101.toSeq == Seq((1L, 10L), (21L, 8L)),
      s"got ${s101.mkString(";")}")
    // doc 102 (fully contaminated): no kept segments at all
    assert(!out.contains(102L))
    // doc 103 (clean): exactly one whole-doc segment
    val s103 = out(103L)
    assert(s103.length == 1 && s103.head.getLong(2) == 1L
      && s103.head.getLong(3) == 9L)
    // eval docs never appear in the output
    assert(!out.contains(0L))
  }

  test("t9 repetition metrics match a plain-Scala recompute") {
    val full = operators.TextOps.queries("t9_repetition")(spark, sf)
    // per-row operator: no aggregation/join exchange may appear — the
    // only exchange is the output ORDER BY's range partitioning
    val shuffles = full.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan"))
      .count(l => l.contains("Exchange") && !l.contains("rangepartitioning"))
    assert(shuffles == 0, s"t9 must run at scan speed, saw $shuffles shuffles")
    val out = full.filter(col("doc_id") < 5).collect()
    val texts = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 5).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val toks = texts(r.getLong(0)).trim.split("\\s+").toSeq
      val n = toks.size.toLong
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val topBi = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == toks.distinct.size.toLong)
      assert(math.abs(r.getDouble(3) -
        BigDecimal(toks.distinct.size.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(r.getDouble(4) -
        BigDecimal(topBi * 2.0 / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("t10 PII scrub removes every injected email/IP/phone") {
    import graft.functions.TextFunctions._
    val out = operators.TextOps.queries("t10_pii_scrub")(spark, sf)
    val rows = out.collect()
    assert(rows.length == 500)
    // every doc carries exactly the one synthetic instance per class
    assert(rows.forall(r => r.getLong(1) == 1 && r.getLong(2) == 1 &&
      r.getLong(3) == 1))
    // direct column check: the scrubbed text carries tags, not PII
    val clean = spark.sql(
      """SELECT 'mail me at a.b-c@x-y.example.org or 10.0.0.1
        | tel 555-123-4567 end' AS s""".stripMargin.replace("\n", ""))
      .select(piiScrub(col("s"))).collect()(0).getString(0)
    assert(clean == "mail me at <EMAIL> or <IP> tel <PHONE> end", clean)
  }

  test("x7 epoch shuffle is deterministic, balanced, and key-consistent") {
    val q = operators.Pipeline.queries("x7_epoch_shuffle")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "epoch shuffle must replay identically")
    // shard is the key's first hex byte → 256 uniform buckets
    assert(a.forall(r => r.getLong(2) ==
      java.lang.Long.parseLong(r.getString(1).take(2), 16)))
    val perShard = a.groupBy(_.getLong(2)).values.map(_.size)
    assert(perShard.max <= 12, s"shard skew: max ${perShard.max} of 500")
    // output arrives in key order
    val keys = a.map(_.getString(1)).toSeq
    assert(keys == keys.sorted)
  }

  test("x8 composition stages each fire on an adversarial corpus") {
    import spark.implicits._
    // eval doc 0; corpus: 20 = exact dup of 21 (dedup keeps 21... no,
    // keeps the LOWER id 20), 22 = contaminated (shares eval text),
    // 23 = low quality (no stopwords, tiny), 24 = clean survivor
    val good = "the quick brown fox jumps over the lazy dog and " * 8
    val eval0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      (0L, eval0),
      (20L, good + "unique tail one"),
      (21L, good + "unique tail one"), // exact dup of 20
      (22L, good + eval0),             // carries an eval 5-gram
      (23L, "zz qq"),                  // fails the quality cut
      (24L, good + "unique tail two")) // clean survivor
    val out = operators.Pipeline.cleanCorpus(rows.toDF("doc_id", "text"))
      .agg(sum("n_docs")).collect()(0).getLong(0)
    // survivors: 20 (dup winner) + 24; 21 deduped, 22 decontaminated,
    // 23 quality-cut, 0 is eval-side
    assert(out == 2, s"expected 2 survivors, got $out")
  }

  test("t9 top-bigram fold property: equals the naive frequency count") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab"))
    val prop = Prop.forAll(Gen.listOfN(60, gen)) { docs =>
      val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks")
        .select(col("id"),
          graft.functions.TextFunctions.topBigramCount(col("toks")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.zipWithIndex.forall { case (t, i) =>
        val naive =
          if (t.size < 2) 0L
          else t.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(_.size).max.toLong
        got(i.toLong) == naive
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("x5 profile quantiles fuse into the same single pass") {
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
    val cols = Seq("l_quantity", "l_returnflag")
    val prof = operators.Pipeline.profile(li, cols,
      quantiles = Seq(0.5, 0.95))
    val rows = prof.collect().map(r => r.getString(0) -> r).toMap
    // numeric column carries sketch quantiles within tight tolerance
    // of the exact percentiles; non-numeric columns carry null
    val qs = rows("l_quantity").getSeq[Double](6)
    val exact = li.selectExpr(
      "percentile(l_quantity, array(0.5D, 0.95D)) AS p")
      .collect().head.getSeq[Double](0)
    qs.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= math.max(1.0, e * 0.02), s"$a vs $e") }
    assert(rows("l_returnflag").isNullAt(6))
    // still one aggregation shuffle
    val plan = prof.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan"))
      .count(l => l.contains("Exchange") && !l.contains("rangepartitioning"))
    assert(plan == 1, s"quantile profile not single-pass: $plan")
  }

  test("x10 source cap matches the window replay; heap, not window") {
    val out = operators.Pipeline.queries("x10_source_cap")(spark, sf)
    // window replay of the same rank (the oracle's shape)
    val key = substring(md5(col("doc_id").cast("string")), 1, 13)
    val want = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), key.as("k"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("k"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= 10)
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // every source is capped, and the published plan aggregates with
    // the bounded heap — no Window node funneling a mega-source
    assert(got.groupBy(_._1).values.forall(_.size <= 10))
    val plan = out.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(!plan.contains("Window"), plan.take(2000))
    // growth stability: adding a high-hash doc to a FULL source leaves
    // the kept set unchanged (its key sorts after every kept key)
    import spark.implicits._
    val base = (0L until 30L).map(i => ("s0", i)).toDF("source", "doc_id")
    def capped(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val k = conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long")
      df.select(col("source"), col("doc_id"), k.as("k"))
        .groupBy("source")
        .agg(functions.expressions.TopK
          .topKByScore(-col("k").cast("double"), col("doc_id"), 10).as("top"))
        .select(explode(col("top.id")).as("id"))
        .collect().map(_.getLong(0)).toSeq
    }
    val kept = capped(base)
    // find an id whose hash key exceeds the current max kept key
    val maxKept = kept.map(i =>
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString).take(13), 16)).max
    val extra = (100L until 300L).find(i =>
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString).take(13), 16) > maxKept).get
    val kept2 = capped(base.union(Seq(("s0", extra)).toDF("source", "doc_id")))
    assert(kept2 == kept, "cap not stable under high-hash growth")
  }

  test("x12 chunking conserves tokens and overlaps by exactly W-S") {
    import spark.implicits._
    // docs sized around the window boundaries: < W, == W, W+1, long
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, mk(10)), (2L, mk(64)), (3L, mk(65)), (4L, mk(500)))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x12").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Pipeline.queries("x12_chunking")(spark, dir)
      .collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    // chunk counts: 1, 1, 2, 1+ceil(436/48)=11
    assert(byDoc(1L).size == 1 && byDoc(2L).size == 1)
    assert(byDoc(3L).size == 2 && byDoc(4L).size == 11)
    // every token of doc 4 appears in order when overlaps are removed:
    // chunk i contributes its tokens from offset 16 on (i > 0)
    val rebuilt = byDoc(4L).zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getString(2).split(" ").toSeq
      if (i == 0) toks else toks.drop(16)
    }
    assert(rebuilt.toSeq == (1 to 500).map(i => s"t$i"))
    // boundary doc: second chunk starts at token 49 and carries 17 tokens
    val c2 = byDoc(3L)(1)
    assert(c2.getString(2).split(" ").head == "t49")
    assert(c2.getLong(3) == 17L)
  }

  test("v11 domain discovery separates well-separated blobs") {
    import spark.implicits._
    // two orthogonal 64-dim blobs: k=2 k-means must split them exactly
    val dim = 64
    val mkVec = (axis: Int, i: Int) => {
      val a = Array.fill(dim)(0.001f * ((i * 7919 + axis) % 13))
      a(axis) = 10f + (i % 3) * 0.1f
      a
    }
    val rows = (0 until 40).map(i => (i.toLong, mkVec(if (i % 2 == 0) 0 else 32, i)))
    val e = rows.toDF("vec_id", "embedding")
    val (assigned, cents) = graft.operators.Ivf.fit(e, 2, 5)
    val got = assigned.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val even = (0 until 40 by 2).map(i => got(i.toLong)).toSet
    val odd = (1 until 40 by 2).map(i => got(i.toLong)).toSet
    assert(even.size == 1 && odd.size == 1 && even != odd)
  }

  test("x15 chunk dedup: recycled 64-token chunk flagged in both docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def filler(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(100000)}").mkString(" ")
    val shared = (1 to 64).map(i => s"c$i").mkString(" ")
    // doc 1: shared chunk EXACTLY at chunk boundary 0; doc 2: same
    // chunk at ITS boundary 0 + own tail; doc 3: unrelated
    val docs = Seq(
      (1L, s"$shared ${filler(64)}"),
      (2L, s"$shared ${filler(30)}"),
      (3L, filler(128)))
    val dir = java.nio.file.Files.createTempDirectory("x15").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Pipeline.queries("x15_chunk_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((2L, 0L)), s"doc3: ${got(3L)}")
  }

  test("x24 corpus diff: every class surfaces, unchanged rows absent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ids chosen so each class is non-empty under the fixture rules:
    // 7 → added (absent from v1), 13 → removed (absent from v2),
    // 11 → changed (revised text), 1/2/3 → unchanged (must NOT emit)
    val docs = Seq(1L, 2L, 3L, 7L, 11L, 13L).map(i => (i, s"text of doc $i"))
    val dir = java.nio.file.Files.createTempDirectory("x24").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Pipeline.queries("x24_corpus_diff")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(7L -> "added", 11L -> "changed", 13L -> "removed"),
      s"got $got")
  }

  test("x26 cross-source dup attribution: recycled chunk flags BOTH sources") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val shared = (1 to 64).map(i => s"c$i").mkString(" ")
    def filler(n: Int) = (1 to n).map(i => s"u${n}_$i").mkString(" ")
    // vendor B re-sells one of vendor A's chunks; vendor C is clean
    val rows = Seq((1L, s"$shared ${filler(64)}", "srcA"),
      (2L, s"$shared ${filler(30)}", "srcB"),
      (3L, filler(128), "srcC"))
    val dir = java.nio.file.Files.createTempDirectory("x26").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Pipeline
      .queries("x26_source_dup_report")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("srcA") == ((2L, 1L)) && got("srcB") == ((2L, 1L)),
      s"shared chunk must flag both vendors: $got")
    assert(got("srcC") == ((2L, 0L)), s"clean vendor flagged: $got")
  }

  test("x16 DSIR: target-like docs score above off-domain docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // target exemplars (doc_id < 20) use the "medical" vocabulary;
    // corpus docs 20-29 are medical-like, 30-39 are legal-like
    val rnd = new scala.util.Random(5)
    def doc(vocab: Seq[String], n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val med = Seq("dose", "patient", "trial", "symptom", "clinical")
    val leg = Seq("court", "statute", "plaintiff", "appeal", "contract")
    val docs = (0L to 19L).map(i => (i, doc(med, 50))) ++
      (20L to 29L).map(i => (i, doc(med, 50))) ++
      (30L to 39L).map(i => (i, doc(leg, 50)))
    val dir = java.nio.file.Files.createTempDirectory("x16").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Pipeline.queries("x16_dsir_select")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val medRows = got.filter(_._1 < 30)
    val legRows = got.filter(_._1 >= 30)
    assert(medRows.forall(_._3), "every medical-like doc must be kept")
    assert(legRows.forall(!_._3), "every legal-like doc must be dropped")
    assert(medRows.map(_._2).min > legRows.map(_._2).max,
      "score separation between domains")
  }

  test("t19 BPE pairs: hand-checked counts on a fixed corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // "abab abc" -> pairs ab,ba,ab / ab,bc ; "ab" -> ab
    val docs = Seq((1L, "abab abc"), (2L, "ab x"))
    val dir = java.nio.file.Files.createTempDirectory("t19").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.queries("t19_bpe_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("ab", 4L), ("ba", 1L), ("bc", 1L)), s"pairs: $got")
  }

  test("t20 boilerplate strip recovers the body text exactly") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.TextOps.queries("t20_boilerplate_strip")(spark, sf)
      .select("doc_id", "clean_md5")
    val want = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        md5(trim(regexp_replace(col("text"), "\\s+", " "))).as("m"))
    assert(got.join(want, "doc_id").filter(col("clean_md5") =!= col("m"))
      .count() == 0, "stripping the grafted skeleton must yield the body")
    // nav/footer CONTENT is gone, not just the tags
    val frac = graft.operators.TextOps.queries("t20_boilerplate_strip")(spark, sf)
      .agg(max(col("kept_frac"))).head().getDouble(0)
    assert(frac < 1.0, "boilerplate must reduce length")
  }

  test("t18 gopher rules: each rule fires on its boundary case") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val good = "the and that have with " + Seq.fill(60)("word").mkString(" ")
    val short = "the and that have with word"        // < 50 words
    val sym = "the and that have with " + Seq.fill(60)("####").mkString(" ")
    val nostop = Seq.fill(60)("zzzz").mkString(" ")  // no gopher stopwords
    val docs = Seq((1L, good), (2L, short), (3L, sym), (4L, nostop))
    val dir = java.nio.file.Files.createTempDirectory("t18").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.queries("t18_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false),
      s"keep flags: $got")
  }

  test("x14 curriculum: stage bands the rounded quality; ord is md5") {
    val rows = graft.operators.Pipeline.queries("x14_curriculum")(spark, sf)
      .collect()
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    rows.foreach { r =>
      val (id, q, stage, ord) =
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))
      val want =
        if (q >= 0.7) 0L else if (q >= 0.6) 1L else if (q >= 0.5) 2L else 3L
      assert(stage == want, s"doc $id quality $q staged $stage, want $want")
      assert(ord == md5(s"cur:$id"), s"doc $id ord key mismatch")
    }
    // result is the curriculum order and uses more than one stage
    val keys = rows.map(r => (r.getLong(2), r.getString(3))).toSeq
    assert(keys == keys.sorted, "not in (stage, ord) order")
    assert(keys.map(_._1).distinct.size > 1, "degenerate single stage")
  }

  test("t23 readability: sentence graft arithmetic + formula replay") {
    val rows = SparkEntry.queries("t23_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the grafted period lands after every g-th token, so the regex
    // sentence count must equal max(floor(n_words / g), 1) — proves
    // the detection actually fired on the skeleton
    rows.foreach { r =>
      val (id, nW, nS, nY) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val g = 5 + id % 7
      assert(nS == math.max(nW / g, 1L),
        s"doc $id: n_sentences $nS != max($nW / $g, 1)")
      val wps = nW.toDouble / nS
      val spw = nY.toDouble / nW
      assert(r.getDouble(4) == 206.835 - 1.015 * wps - 84.6 * spw)
      assert(r.getDouble(5) == 0.39 * wps + 11.8 * spw - 15.59)
    }
    // hand-checked syllable groups on an injected doc
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t23").toString
    Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = graft.operators.TextOps.queries("t23_readability")(spark, dir)
      .collect()(0)
    // vowel groups: e, a, a, o, a, a → 6; 6 words; 1 sentence (n < g)
    assert((one.getLong(1), one.getLong(2), one.getLong(3)) == ((6L, 1L, 6L)))
  }

  test("x21 threshold sweep: per-doc replay, monotone keep curves") {
    val out = SparkEntry.queries("x21_threshold_sweep")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (3000L to 7000L by 500L).toSeq)
    // keep curves are non-increasing in the threshold
    assert(out.sliding(2).forall(p => p(0)._2 >= p(1)._2 &&
      p(0)._3 >= p(1)._3), "non-monotone sweep")
    // per-doc replay of one interior threshold (the level-table
    // aggregation must equal the naive per-doc filter)
    val q = Tables.load(spark, sf, "documents")
      .select(round(graft.functions.TextFunctions
        .qualityScore(col("text")), 4).as("q"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("t"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val tau = 0.5
    val kept = q.filter(p => math.round(p._1 * 10000) >= tau * 10000)
    val row = out.find(_._1 == 5000L).get
    assert(row._2 == kept.length && row._3 == kept.map(_._2).sum,
      s"sweep row $row != replay (${kept.length}, ${kept.map(_._2).sum})")
    assert(row._4 == kept.length * 10000L / q.length)
  }

  test("x20 priority sample: ES window replay, size-biased, heap plan") {
    val out = SparkEntry.queries("x20_priority_sample")(spark, sf)
    // window replay of the same ln(u)/w key (the oracle's shape)
    val u = (conv(substring(md5(concat(lit("pri:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("double") +
      lit(0.5)) / lit(4503599627370496.0)
    val key = log(u) / greatest(col("n_chars"), lit(1L)).cast("double")
    val want = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), key.as("k"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("k").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= 10)
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = out.collect()
    assert(got.nonEmpty &&
      got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        want.toSeq)
    // the whole point of WEIGHTED sampling: the sample is size-biased —
    // its mean length exceeds the corpus mean (deterministic for the
    // fixed corpus; u^(1/w) inclusion odds grow with w)
    val sampleMean = got.map(_.getLong(3)).sum.toDouble / got.length
    val corpusMean = Tables.load(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample not size-biased: $sampleMean <= $corpusMean")
    // published plan selects with the bounded heap, not a window —
    // a mega-source costs each map task O(k), never a single reducer
    val plan = out.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
