package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The d2 candidate-generation document-frequency cap: boilerplate
  * shingles shared by m documents would emit m² candidate pairs (one
  * hot join key goes quadratic on a header/footer-heavy corpus); the
  * cap must bound candidates without changing the reported pair set. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 60 documents sharing one 5-token boilerplate sentence (one hot
  // shingle, df=60) + unique filler, plus one genuine near-dup pair
  // (58/59) that shares many NON-hot shingles
  private lazy val corpus = {
    val boiler = "terms of service apply here"
    val uniq = (0 until 58).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c $boiler v${i}a v${i}b v${i}c"))
    // 20 shared tokens + 1 differing + boilerplate → 16 shared non-hot
    // shingles, exact Jaccard 17/27 ≈ 0.63 ≥ 0.5
    val shared20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val nearA = (58L, s"$shared20 xend $boiler")
    val nearB = (59L, s"$shared20 yend $boiler")
    (uniq :+ nearA :+ nearB).toDF("doc_id", "text")
  }

  test("df cap bounds candidate pairs from hot shingles") {
    val uncapped = Dedup.candidatePairs(corpus, None).count()
    val capped = Dedup.candidatePairs(corpus, Some(10L)).count()
    // the hot boilerplate shingle alone links every doc to every other
    assert(uncapped >= 60L * 59 / 2, s"uncapped=$uncapped")
    // capped: only the near-dup pair's non-hot shared shingles remain
    assert(capped < 100, s"capped=$capped")
    assert(capped >= 1)
  }

  test("corpusRows answers from metadata — zero Spark jobs (d2/d7/d9 caps)") {
    // parquet-backed corpus: footer counts, read on the driver
    val dir = graft.core.TempDirs.fresh("graft_caps")
    spark.range(0, 1234).selectExpr("id AS doc_id", "'x y z' AS text")
      .write.parquet(s"$dir/docs")
    val pq = spark.read.parquet(s"$dir/docs")
    // array-backed corpus: fragment-manifest counts
    val uri = s"$dir/arr"
    graft.sources.GraftArray.create(spark, uri, graft.core.ArraySchema(
      graft.core.ArrayKind.Sparse,
      Seq(graft.core.DimensionSpec("doc_id",
        org.apache.spark.sql.types.LongType)),
      Seq(graft.core.AttributeSpec("text",
        org.apache.spark.sql.types.StringType))))
    graft.sources.GraftArray.write(spark, uri,
      spark.range(0, 777).selectExpr("id AS doc_id", "'x' AS text"))
    val arr = spark.read.format("graftarray").option("path", uri).load()

    // count only jobs tagged with our job group — job-count deltas
    // race (AQE splits even range(1).count() into several jobs)
    val probe = new java.util.concurrent.atomic.AtomicInteger
    val sentinel = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == "caps-probe") probe.incrementAndGet()
        if (g == "caps-sentinel") sentinel.incrementAndGet()
        ()
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(l)
    try {
      sc.setJobGroup("caps-probe", "corpusRows must not run jobs")
      assert(Dedup.corpusRows(pq) == 1234L)
      assert(Dedup.corpusRows(arr) == 777L)
      // a Project on top (the normalizeTs/select shape) still answers
      assert(Dedup.corpusRows(pq.select(col("doc_id"))) == 1234L)
      sc.setJobGroup("caps-sentinel", "flush listener bus")
      spark.range(1).count()
      sc.clearJobGroup()
      val deadline = System.nanoTime + 30L * 1000000000
      while (sentinel.get() < 1 && System.nanoTime < deadline)
        Thread.sleep(10)
      // FIFO bus: the sentinel's event arrived, so any probe-group
      // event would already have arrived too — there must be none
      assert(sentinel.get() >= 1)
      assert(probe.get() == 0, s"corpusRows ran ${probe.get()} job(s)")
      // a filtered frame cannot answer from metadata — falls back
      assert(Dedup.corpusRows(pq.filter(col("doc_id") < 100)) == 100L)
    } finally { sc.clearJobGroup(); sc.removeSparkListener(l) }
  }

  test("d10: injected verbatim spans are covered exactly (Lee et al. cut)") {
    // A and B share a verbatim 60-token span (cross-doc dup); C
    // repeats its own 55-token block (intra-doc dup — ExactSubstr
    // counts it); D is clean and must report zero
    val span60 = (1 to 60).map(i => s"s$i").mkString(" ")
    val prefA = (1 to 25).map(i => s"a$i").mkString(" ")
    val sufB = (1 to 25).map(i => s"b$i").mkString(" ")
    val block55 = (1 to 55).map(i => s"c$i").mkString(" ")
    val corpus4 = Seq(
      (0L, s"$prefA $span60"), // span at 25..84, n=85
      (1L, s"$span60 $sufB"), // span at 0..59, n=85
      (2L, s"$block55 $block55"), // n=110, fully self-duplicated
      (3L, (1 to 80).map(i => s"d$i").mkString(" ")) // clean
    ).toDF("doc_id", "text")
    val res = Dedup.substringDedup(corpus4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 11 shared 50-windows inside the 60-span; union covers 60 tokens
    assert(res(0L) == ((85L, 11L, 60L)))
    assert(res(1L) == ((85L, 11L, 60L)))
    // self-repeat at shift 55: dup starts {0..5} ∪ {55..60} = 12
    // windows whose interval union is the WHOLE doc
    assert(res(2L) == ((110L, 12L, 110L)))
    assert(res(3L) == ((80L, 0L, 0L)))
  }

  test("connected components: min-label propagation is transitive") {
    // a 4-chain (1-2-3-4) plus a separate pair (10-11): every member
    // must reach the smallest id in its component even without a
    // direct edge to it
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("i", "j")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // order of endpoints must not matter
    val rev = Dedup.connectedComponents(
      Seq((4L, 3L), (2L, 1L), (3L, 2L)).toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(rev.values.toSet == Set(1L))
  }

  test("CC driver fast path == distributed loop on a mixed random graph") {
    // chains, stars, pairs and singleton-free ids interleaved; the
    // driver union-find (under the edge cap) and the distributed
    // min-label loop (cap forced to 0) must produce identical labels
    val rnd = new scala.util.Random(7)
    val edges = (
      (0 until 200).map(i => (i.toLong, (i + 1).toLong)) ++       // chain
      (0 until 50).map(i => (1000L, 1000L + 17 * i + 1)) ++       // star
      (0 until 100).map(_ =>
        { val a = rnd.nextInt(3000).toLong; (a + 5000, a + 5000 + rnd.nextInt(5) + 1) })
    ).toDF("i", "j")
    val viaDriver = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val work = spark.newSession()
    work.conf.set("graft.cc.driverEdgeCap", "0")
    val rebound = work.createDataFrame(edges.rdd, edges.schema)
    val viaLoop = Dedup.connectedComponents(rebound)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver.nonEmpty)
  }

  test("df cap leaves the reported near-dup pair set unchanged") {
    val uncapped = Dedup.jaccardPairsOn(corpus, 0.5, None)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardPairsOn(corpus, 0.5, Some(10L))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(uncapped == capped)
    assert(capped.contains((58L, 59L)), s"lost the genuine pair: $capped")
  }

  test("simhash degenerate band: identical sigs collapse, result exact") {
    // 500 identical signatures (one hot duplicate cluster) + 40
    // distinct ones, several within hamming ≤ 6 of each other
    val m = 500
    val dup = (0 until m).map(i => (i.toLong, 0x0123456789ABCDEL))
    val near = (0 until 40).map(i =>
      (1000L + i, 0x0123456789ABCDEL ^ (1L << (i % 60)) ^ (1L << 59)))
    val sig = (dup ++ near).toDF("doc_id", "sim")
    // the band join input is DISTINCT signatures: 41 groups × 7 bands,
    // not 540 × 7 — the m-identical bucket costs ONE join row
    val members = Dedup.simhashMembers(sig)
    val reps = members.filter(col("doc_id") === col("gid")).select("sim")
    assert(reps.count() == 41)
    assert(Dedup.simhashBandRows(reps, Some(Dedup.HotBandCap)).count()
      == 41L * 7)
    // and the reported pair set equals the brute-force O(n²) answer
    val all = sig.as[(Long, Long)].collect()
    val exact = (for {
      (i, si) <- all; (j, sj) <- all
      if i < j && java.lang.Long.bitCount(si ^ sj) <= 6
    } yield (i, j)).toSet
    val got = Dedup.simhashPairs(sig)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(got == exact,
      s"missed=${(exact -- got).size} spurious=${(got -- exact).size}")
    assert(got.size >= m * (m - 1) / 2) // the dup cluster's pairs
    // a hot band (> cap distinct sigs sharing it) is dropped from
    // candidate generation: craft 20 distinct sigs sharing band 0
    val shared = (0 until 20).map(i => (2000L + i, (i.toLong << 9) | 0x155L))
    val sig2 = shared.toDF("doc_id", "sim")
    val r2 = Dedup.simhashMembers(sig2)
      .filter(col("doc_id") === col("gid")).select("sim")
    val kept = Dedup.simhashBandRows(r2, Some(8L)).count()
    assert(kept < 20L * 7, s"hot band not dropped: $kept rows")
  }

  test("identity groups are (gid, member) pairs — no group-sized array rows") {
    import org.apache.spark.sql.types.ArrayType
    // a synthetic mega-group: 2k documents with ONE signature. The
    // former collect_list representation built a single row holding
    // every id (multi-GB at adversarial multiplicity, round-7
    // verdict #1); the pair representation is one fixed-width row per
    // member — every intermediate schema is array-free and the window /
    // join state spills instead of materializing the group.
    val m = 2000
    val mega = spark.range(m).select(col("id").as("doc_id"),
      lit(0x0123456789ABCDEL).as("sim"))
      .unionByName(Seq((900000L, 0x0123456789ABCA1L)) // hamming 7 away
        .toDF("doc_id", "sim"))
    val members = Dedup.simhashMembers(mega)
    assert(members.schema.fields.forall(
      f => !f.dataType.isInstanceOf[ArrayType]),
      s"group representation carries an array: ${members.schema}")
    assert(members.count() == m + 1)
    // every member is tagged with the group min, not collected
    assert(members.filter(col("doc_id") < m)
      .agg(max(col("gid"))).head().getLong(0) == 0L)
    // the full pair set is still produced (output-bound): count only —
    // m·(m−1)/2 intra pairs for the mega-group, none for the loner
    val n = Dedup.simhashPairs(mega).count()
    assert(n == m.toLong * (m - 1) / 2, s"pair count $n")
  }

  test("d6 long-span dup pairs surface injected verbatim spans") {
    import spark.implicits._
    // a 40-token verbatim span shared by docs 0 and 1 under different
    // surrounding context; doc 2 shares nothing
    val span = (1 to 40).map(i => s"w$i").mkString(" ")
    val docsDf = Seq(
      (0L, "a1 a2 a3 " + span),
      (1L, span + " b1 b2"),
      (2L, (1 to 50).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupPairs(docsDf, Some(1024)).collect()
    assert(out.length == 1, out.mkString(","))
    // a 40-token span contains exactly 40-32+1 = 9 32-token windows,
    // all of them shared; windows crossing the span edge differ
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 1L &&
      out.head.getLong(2) == 9L, out.head.toString)
    // sub-span-length overlaps (31 tokens) surface nothing
    val short = (1 to 31).map(i => s"s$i").mkString(" ")
    val none = Dedup.spanDupPairs(Seq(
      (0L, "x1 x2 " + short), (1L, short + " y1")).toDF("doc_id", "text"),
      Some(1024)).count()
    assert(none == 0L)
  }

  test("d7 containment surfaces subset-dups that symmetric Jaccard misses") {
    // a 12-token excerpt verbatim inside a 200-token host document:
    // containment(excerpt in host) = 1.0, Jaccard ≈ 8/189 ≪ 0.5
    val host = (1 to 200).map(i => s"h$i").mkString(" ")
    val excerpt = (50 to 61).map(i => s"h$i").mkString(" ")
    val df = Seq(
      (1L, host), (2L, excerpt),
      (3L, "completely unrelated filler text with no overlap at all")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, 0.8, None).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 1L)), s"got ${cont.mkString(",")}")
    val c = cont.head
    assert(c.getDouble(3) == 1.0)
    // the symmetric-Jaccard operator at its 0.5 threshold sees nothing
    assert(Dedup.jaccardPairsOn(df, 0.5, None).count() == 0)
    // direction matters: the host is NOT contained in the excerpt
    assert(!cont.exists(r => r.getLong(0) == 1L))
  }

  test("incremental dedup flags base twins and intra-increment dups") {
    import spark.implicits._
    // base: docs 0-2 plus 100 (id ABOVE the increment range);
    // increment: 10 dups doc 1's fp, 11/12 share a NEW fp
    // (intra-increment dup), 13 is unique, 14 dups base doc 100's fp —
    // history must win even when the base twin's id is larger
    val base = Seq((0L, "fa"), (1L, "fb"), (2L, "fc"), (100L, "fz"))
      .toDF("doc_id", "fp")
    val inc = Seq((10L, "fb"), (11L, "fx"), (12L, "fx"), (13L, "fy"),
      (14L, "fz")).toDF("doc_id", "fp")
    val out = Dedup.incrementalDedup(base, inc)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((10L, 1L, true), (11L, 11L, false),
      (12L, 11L, true), (13L, 13L, false), (14L, 100L, true)),
      got.toString)
    // the base side goes through a broadcast fingerprint semi-filter —
    // it must never shuffle wholesale for a small increment
    val plan = out.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
  }

  test("winnowing kernel equals naive selection; shared-run guarantee") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // kernel vs naive rightmost-min-per-window on randomized arrays
    val rnd = new scala.util.Random(42)
    val arrays = Seq.fill(40)(Seq.fill(3 + rnd.nextInt(60))(rnd.nextLong(1000)))
    def naive(hs: Seq[Long], w: Int): Seq[(Long, Long)] =
      if (hs.length < w) Seq.empty
      else (0 to hs.length - w).map { i =>
        val win = hs.slice(i, i + w)
        val m = win.min
        val p = (0 until w).filter(win(_) == m).max + i
        ((p + 1).toLong, m)
      }.distinct
    val got = arrays.toDF("hs")
      .select(graft.functions.expressions.Kernels.winnow(col("hs"), 8).as("f"))
      .as[Seq[(Long, Long)]].collect()
    arrays.zip(got).foreach { case (hs, g) =>
      assert(g == naive(hs, 8), s"winnow mismatch on $hs")
    }
    // guarantee: two docs sharing >= w+k-1 = 12 tokens produce a
    // common fingerprint HASH through the t17 query
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val docA = s"alpha beta gamma $shared delta epsilon zeta"
    val docB = s"one two three four five six $shared seven eight"
    val dir = java.nio.file.Files.createTempDirectory("t17").toString
    Seq((1L, docA, "en", "a", 1L), (2L, docB, "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = graft.operators.TextOps.queries("t17_winnowing")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet)
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "a 12-token shared run must yield a common winnowing fingerprint")
    // the fused kernel (winnowText) is bit-identical to the two-stage
    // declarative form (hash60 in a HOF into winnow) it replaced
    import graft.functions.TextFunctions.{tokens, hash60}
    val df = Seq(docA, docB).toDF("text")
    val toks = tokens(col("text"))
    val declarative = df.select(
      graft.functions.expressions.Kernels.winnow(
        transform(sequence(lit(1), size(toks) - 4),
          i => hash60(array_join(slice(toks, i, lit(5)), " "))), 8))
      .as[Seq[(Long, Long)]].collect().toSeq
    val fused = df.select(
      graft.functions.expressions.Kernels.winnowText(toks, 5, 8))
      .as[Seq[(Long, Long)]].collect().toSeq
    assert(fused == declarative && fused.forall(_.nonEmpty))
  }

  test("d8 winnowing dedup surfaces an injected shared-run pair") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val shared = (1 to 30).map(i => s"copy$i").mkString(" ")
    val rnd = new scala.util.Random(7)
    def filler(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val docs = Seq(
      (1L, s"${filler(40)} $shared ${filler(40)}"),
      (2L, s"${filler(55)} $shared ${filler(25)}")) ++
      (3L to 30L).map(i => (i, filler(90)))
    val dir = java.nio.file.Files.createTempDirectory("d8").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Dedup.queries("d8_winnow_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "a 30-token shared run must surface the pair through winnowing")
    // unrelated filler docs should not pair up at >= 2 shared prints
    assert(pairs.forall { case (i, j) => (i, j) == ((1L, 2L)) },
      s"unexpected pairs: $pairs")
  }

  test("d9 char-ngram dedup surfaces whitespace-free near-duplicates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // no word boundaries at all — the corpus d2's token shingles
    // cannot see (one giant "token" per doc)
    val rnd = new scala.util.Random(11)
    def rndStr(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val base = rndStr(400)
    val docs = Seq(
      (1L, base),
      (2L, base.substring(0, 390) + rndStr(10))) ++
      (3L to 20L).map(i => (i, rndStr(400)))
    val dir = java.nio.file.Files.createTempDirectory("d9").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.queries("d9_char_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the planted pair, got: ${got.toSeq}")
    assert(got.head._3 >= 0.9, "390/400 shared chars should score >= 0.9")
    // sanity: d2's token shingles are blind here (docs are one token)
    val d2 = graft.operators.Dedup.queries("d2_ngram_jaccard")(spark, dir)
    assert(d2.count() == 0, "token shingles should see nothing")
  }

  test("d9 short near-dups survive via the unsampled index (hard path)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // SHORT whitespace-free docs (~40 chars → ~36 grams, well under
    // the 128-gram sampling cutoff): identical pair must surface
    // through the ≥1-shared unsampled gate — mod-4 sampling alone
    // could leave such a pair with < 3 surviving shared grams
    val rnd = new scala.util.Random(13)
    def rndStr(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val short = rndStr(40)
    val docs = Seq((1L, short), (2L, short)) ++
      (3L to 15L).map(i => (i, rndStr(40)))
    val dir = java.nio.file.Files.createTempDirectory("d9s").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.queries("d9_char_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"short identical pair lost: $got")
  }

  test("d12 keeps the best-quality member, not the lowest id") {
    import org.apache.spark.sql.functions.{length => slen}
    // docs 1 and 2 are near-dups (jaccard ≥ 0.8); doc 1 carries a
    // punctuation tail that lowers its t2 quality, so the keeper must
    // be the HIGHER id — the exact case min-label dedup gets wrong
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$base !!! ??? ;;;"),
      (2L, base),
      (3L, "entirely unrelated words nothing shared here at all"))
    val dir = java.nio.file.Files.createTempDirectory("d12t").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", slen(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("d12_keep_best")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)),
      s"cluster 1 should keep doc 2 (better quality): ${got.toSeq}")
  }

  test("bloomOf: no false negatives, bounded false positives (d11)") {
    val keys = (0L until 2000L).map(i => (i, s"key-$i")).toDF("id", "k")
    val (bits, hits) = Dedup.bloomOf(spark, keys, col("k"), keys)
    // every inserted key probes positive — the guarantee d11's gated
    // is_dup path rests on
    val misses = keys.filter(!hits(col("k"))).count()
    assert(misses == 0L, s"$misses false negatives")
    // disjoint probe set: fpr must sit near the ~0.2% design point
    // (generous 2% bar — the property is boundedness, not the exact ε)
    val other = (0L until 5000L).map(i => (i, s"other-$i")).toDF("id", "k")
    val fp = other.filter(hits(col("k"))).count()
    assert(fp <= 100L, s"false-positive count $fp of 5000 probes")
    // build is bounded by the FILTER, not the corpus
    assert(bits.length <= (1 << 22) / 64, s"word array ${bits.length}")
  }

  test("d14 sees what the set family can't: corruption yes, reorder no") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"tok$i").mkString(" ") // ~240 chars
    val corrupted = a.updated(11, 'q').updated(12, 'q').updated(13, 'q')
    val reordered = (1 to 40).map(i => s"tok${41 - i}").mkString(" ")
    val docs = Seq((1L, a), (2L, corrupted), (3L, reordered))
      .toDF("doc_id", "text")
    val got = Dedup.editNeardupPairs(docs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 3 in-place substitutions: edit-near (dist 3), found via the
    // untouched aligned segments
    assert(got == Set((1L, 2L, 3L)), s"got $got")
    // the reordered doc has Jaccard ~1.0 on token SETS but is NOT an
    // edit near-dup — d14 must not pair it
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("d15 waterfall: every tier live, fixtures land in their tiers") {
    val rows = SparkEntry.queries("d15_dedup_waterfall")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet ==
      Set("1_exact", "2_near", "3_edit", "4_unique"), rows.keySet)
    val docs = Tables.load(spark, sf, "documents")
    val nRecrawl = docs.filter(col("doc_id") % 97 === 1).count()
    val nCorrupt = docs.filter(col("doc_id") % 29 === 1 &&
      length(col("text")).between(60, 120)).count()
    assert(nRecrawl > 0 && nCorrupt > 0, "a fixture class is empty")
    // every exact re-crawl copy is caught by the FIRST tier
    assert(rows("1_exact")._1 >= nRecrawl)
    // every corrupted short copy falls through to the EDIT tier (its
    // Jaccard vs the original is 0.15-0.56 — measured at all scales —
    // so the near tier provably can't claim it)
    assert(rows("3_edit")._1 >= nCorrupt)
    assert(rows("4_unique")._1 > 0)
    // integer-div shares: sum within rounding of the whole
    val bpSum = rows.values.map(_._2).sum
    assert(bpSum >= 10000 - 4 && bpSum <= 10000, s"shares sum $bpSum")
  }

  test("d14 mega-cluster: band join sees ONE row per distinct prefix") {
    import spark.implicits._
    // 500 byte-identical docs + a corrupted twin + an unrelated doc —
    // the hot-key case the identical-prefix collapse exists for: the
    // cluster must cost one band-join row, never 500 rows on one key
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corrupted = a.updated(11, 'q').updated(12, 'q').updated(13, 'q')
    val clones = (1L to 500L).map(i => (i, a))
    val docs =
      (clones :+ (601L, corrupted)
        :+ (602L, "entirely different unrelated words nothing shared"))
        .toDF("doc_id", "text")
    val members = Dedup.editPrefixGroups(docs, 5)
    val reps = members.filter(col("doc_id") === col("gid"))
      .select(col("gid"), col("pfx"))
    assert(reps.count() == 3L, "one representative per distinct prefix")
    // the band self-join input: ≤ tau+1 rows per DISTINCT prefix —
    // 500 clones contribute 6 rows, not 3000
    val bandRows = Dedup.editBandRows(reps, 5).count()
    assert(bandRows <= 3L * 6L, s"band rows $bandRows — collapse missing")
    // pair set still complete and output-bound: all 500·499/2 clone
    // pairs at dist 0, each clone × the corrupted twin at dist 3
    val byDist = Dedup.editNeardupPairs(docs, 5)
      .groupBy("dist").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDist.get(0L).contains(500L * 499L / 2L), s"intra: $byDist")
    assert(byDist.get(3L).contains(500L), s"cross: $byDist")
  }

  test("d14 collapse ≡ per-doc blocking on seeded random corpora") {
    import spark.implicits._
    // the collapse must be invisible in the RESULT: brute-force replay
    // of the per-doc blocking contract (pairs sharing ≥1 content
    // aligned segment, lev ≤ tau) over corpora stacked with the nasty
    // cases — duplicate groups, shared prefixes, point corruptions,
    // empty and whitespace-only docs, short docs
    val rnd = new scala.util.Random(7)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    for (trial <- 0 until 3) {
      val base = (0 until 8).map(_ =>
        (0 until (5 + rnd.nextInt(55))).map(_ =>
          ('a' + rnd.nextInt(4)).toChar).mkString(" "))
      val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var id = 0L
      def add(t: String): Unit = { docs += ((id, t)); id += 1 }
      base.foreach { t =>
        add(t)
        if (rnd.nextBoolean()) add(t) // duplicate group member
        if (rnd.nextBoolean()) { // point corruption
          val chars = t.toCharArray
          for (_ <- 0 until (1 + rnd.nextInt(5)) if chars.nonEmpty)
            chars(rnd.nextInt(chars.length)) = 'z'
          add(new String(chars))
        }
      }
      add(""); add("   ") // all-padding prefixes: must pair with nothing
      val df = docs.toSeq.toDF("doc_id", "text")
      val got = Dedup.editNeardupPairs(df, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // brute force over padded 258-char prefixes
      val pfx = docs.map { case (i, t) =>
        (i, t.take(258).padTo(258, ' ')) }
      def segs(p: String): Set[(Int, String)] =
        (0 until 6).map(k => (k, p.substring(k * 43, k * 43 + 43)))
          .filter(_._2.trim.nonEmpty).toSet
      val want = (for {
        (i, pa) <- pfx; (j, pb) <- pfx if i < j
        if segs(pa).intersect(segs(pb)).nonEmpty
        d = lev(pa, pb) if d <= 5
      } yield (i, j, d.toLong)).toSet
      assert(got == want,
        s"trial $trial: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("d3 mega-cluster: minhash band join sees ONE row per distinct sequence") {
    import spark.implicits._
    // 500 byte-identical docs + a one-token-tail variant (75 of 76
    // shingles shared → jac 75/77 ≈ 0.974 ≥ 0.8) + an unrelated doc —
    // the re-crawl hot-key case the identical-sequence collapse exists
    // for: the cluster must cost one band-join row, never 500 rows on
    // each of its 16 band keys
    val a = (1 to 80).map(i => s"tok$i").mkString(" ")
    val variant = ((1 to 79).map(i => s"tok$i") :+ "zzz").mkString(" ")
    val clones = (1L to 500L).map(i => (i, a))
    val docs = (clones :+ (601L, variant) :+ (602L,
      "entirely different unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    val members = Dedup.minhashMembers(docs)
    val reps = members.filter(col("doc_id") === col("gid"))
      .select(col("gid"), col("sh"))
    assert(reps.count() == 3L, "one representative per distinct sequence")
    // the band self-join input: 16 rows per DISTINCT sequence — 500
    // clones contribute 16 rows, not 8000
    val bandRows = Dedup.minhashBandRows(reps, Some(Dedup.HotBandCap)).count()
    assert(bandRows == 3L * 16L, s"band rows $bandRows — collapse missing")
    // pair set still complete and output-bound: all 500·499/2 clone
    // pairs at jac exactly 1.0, each clone × the variant verified ≥ 0.8
    val pairs = Dedup.minhashVerifiedPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val intra = pairs.filter(_._3 == 1.0)
    assert(intra.length == 500 * 499 / 2, s"intra ${intra.length}")
    val cross = pairs.filter(_._2 == 601L)
    assert(cross.length == 500, s"cross ${cross.length}")
    assert(cross.forall(p => p._3 >= 0.8 && p._3 < 1.0))
    assert(pairs.length == 500 * 499 / 2 + 500, s"total ${pairs.length}")
  }

  test("d3 collapse ≡ per-doc banded join on seeded random corpora") {
    import spark.implicits._
    // the collapse must be invisible in the RESULT: replay the
    // pre-collapse per-doc contract (per-doc bands → band self-join →
    // exact Jaccard verify) with the same primitives over corpora
    // stacked with the nasty cases — duplicate groups, token
    // permutations (equal SETS via different sequences), tail
    // variants, and sub-K docs whose shingle set is empty
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val base = (0 until 10).map(_ =>
        (0 until (3 + rnd.nextInt(20))).map(_ =>
          s"w${rnd.nextInt(6)}").mkString(" "))
      val docsBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var id = 0L
      def add(t: String): Unit = { docsBuf += ((id, t)); id += 1 }
      base.foreach { t =>
        add(t)
        if (rnd.nextBoolean()) add(t) // duplicate group member
        if (rnd.nextBoolean()) add(t + " extra") // tail variant
        if (rnd.nextBoolean()) // permutation: same tokens, new order
          add(t.split(" ").reverse.mkString(" "))
      }
      add(""); add("   "); add("a b") // empty shingle sets: pair with nothing
      val df = docsBuf.toSeq.toDF("doc_id", "text").localCheckpoint()
      val got = Dedup.minhashVerifiedPairs(df, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // the replay must drop empty shingle sets UP FRONT: two sub-K
      // docs get identical (empty-set) signatures, band-join into a
      // candidate, and 0/0 Jaccard is a DIVIDE_BY_ZERO error under
      // ANSI — the per-doc form only ever survived on corpora with no
      // sub-K docs. The collapse path excludes them structurally
      // (minhashMembers filters size(sh) > 0), which is the contract:
      // an empty set's Jaccard against anything is undefined/NULL and
      // was never a pair.
      val nonEmpty = df.filter(size(
        graft.functions.TextFunctions.shingles(col("text"), 5)) > 0)
      val sig = nonEmpty.select(col("doc_id"),
        graft.functions.TextFunctions.minhashSignature(
          graft.functions.TextFunctions.shingles(col("text"), 5), 64)
          .as("sig"))
      val bands = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(15)), b =>
          concat_ws("_", b,
            element_at(col("sig"), b * 4 + 1),
            element_at(col("sig"), b * 4 + 2),
            element_at(col("sig"), b * 4 + 3),
            element_at(col("sig"), b * 4 + 4)))).as("band"))
      val cand = bands.as("a").join(bands.as("b"), "band")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
      val sets = nonEmpty.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 5).as("sh"))
      val want = cand
        .join(sets.select(col("doc_id").as("i"), col("sh").as("sa")), "i")
        .join(sets.select(col("doc_id").as("j"), col("sh").as("sb")), "j")
        .withColumn("jac",
          size(array_intersect(col("sa"), col("sb"))).cast("double") /
            size(array_union(col("sa"), col("sb"))).cast("double"))
        .filter(col("jac") >= 0.5)
        .select("i", "j", "jac")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == want,
        s"trial $trial: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("identical-key collapse: no window task, map-side partial agg") {
    import spark.implicits._
    // the round-11 collapse killed the quadratic band join but computed
    // gid with min() OVER (PARTITION BY key) — a window partition is
    // ONE task, so a re-crawl mega-cluster still serialized m
    // full-payload rows through a single core. The round-12 form must
    // (a) carry no Window node at all, (b) aggregate with a PARTIAL
    // (map-side) min on the fingerprint — each mapper contributes one
    // row per distinct key to the shuffle — and (c) keep gid semantics
    // byte-identical: smallest doc_id per EQUAL key.
    val docs = (1L to 50L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
      .unionByName(Seq((99L, "other words entirely unrelated to sequence"))
        .toDF("doc_id", "text"))
    val members = Dedup.minhashMembers(docs)
    val plan = members.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("partial_min"), plan.take(2000))
    assert(members.filter(col("doc_id") <= 50L).select("gid")
      .distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(members.filter(col("doc_id") === 99L)
      .select("gid").head().getLong(0) == 99L)
    // simhash and edit-prefix collapses share the shape
    val sig = Seq((5L, 7L), (6L, 7L), (9L, 8L)).toDF("doc_id", "sim")
    val sm = Dedup.simhashMembers(sig)
    val smPlan = sm.queryExecution.executedPlan.toString
    assert(!smPlan.contains("Window") && smPlan.contains("partial_min"),
      smPlan.take(2000))
    assert(sm.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((5L, 5L), (6L, 5L), (9L, 9L)))
    val ep = Dedup.editPrefixGroups(docs, 2)
    val epPlan = ep.queryExecution.executedPlan.toString
    assert(!epPlan.contains("Window") && epPlan.contains("partial_min"),
      epPlan.take(2000))
  }

  test("lshLayoutOf derives d3's shipped 16x4 layout on this corpus") {
    // the engine default is the DESIGNED layout (round-12 verdict #5):
    // least mid-range leak among layouts with >= 0.999 recall over the
    // measured pair index — d16's sweep proves 16x4 is that choice
    // here, which keeps every d3-family oracle row byte-identical
    assert(operators.Dedup.lshLayoutOf(spark, sf) == ((16, 4)))
    // generalized banding: a rep contributes exactly `bands` rows
    import spark.implicits._
    val reps = Seq((1L, (1 to 40).map(i => s"t$i"))).toDF("gid", "sh")
    for (layout <- Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16)))
      assert(operators.Dedup.minhashBandRows(reps, None, layout)
        .count() == layout._1.toLong, s"layout $layout")
    intercept[IllegalArgumentException] {
      operators.Dedup.minhashBandRows(reps, None, (10, 7))
    }
  }

  test("d16 layout sweep: provable S-curve ordering, shipped layout justified") {
    val rows = SparkEntry.queries("d16_lsh_layout_sweep")(spark, sf)
      .orderBy("rows_per_band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(x => (x._1, x._2)).toSeq ==
      Seq((64L, 1L), (32L, 2L), (16L, 4L), (8L, 8L), (4L, 16L)))
    // 1−(1−j^r)^(64/r) is decreasing in r for 0<j<1, so BOTH columns
    // must be non-increasing down the table (recall over true pairs,
    // leak-through over mid-range pairs) — a provable invariant a
    // broken chain or swapped layout flips
    assert(rows.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
      s"recall not monotone: ${rows.map(_._4).toSeq}")
    assert(rows.map(_._5).sliding(2).forall(p => p(0) >= p(1)),
      s"fp mass not monotone: ${rows.map(_._5).toSeq}")
    // every layout sees the SAME true-pair set
    assert(rows.map(_._3).distinct.length == 1)
    // the report must justify d3's shipped 16×4 layout: recall ≥ 0.999
    // over the corpus's true pairs while leaking strictly less of the
    // mid-range than the wider-band layouts
    val shipped = rows.find(x => x._1 == 16L).get
    assert(shipped._4 >= 999000L, s"shipped recall ${shipped._4}")
    assert(shipped._5 < rows.find(_._1 == 32L).get._5)
  }

  test("d14 fixture pairs all surface with dist <= 5 at sf0.001") {
    val rows = SparkEntry.queries("d14_edit_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fixturePairs = rows.filter(p => p._2 == p._1 + 9300000L)
    assert(fixturePairs.nonEmpty, "no fixture pair surfaced")
    assert(fixturePairs.forall(_._3 <= 5L))
    // every %89==7 doc's corrupted twin must be found (substitutions
    // only touch segment 0; segments 1+ stay aligned — guaranteed)
    val expected = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 89 === 7).count()
    assert(fixturePairs.length.toLong == expected,
      s"${fixturePairs.length} of $expected fixture twins found")
  }
}
