package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Training-data pipeline operators over `documents`: reproducible
  * splits, mixture sampling, sequence packing, and leakage-safe
  * cluster-aware splits — the assembly steps between a cleaned corpus
  * and a training run.
  *
  * Determinism is the design constraint: every assignment derives from
  * md5 of a stable id (no RNG, no partition-order dependence), so a
  * split computed on 1000 executors over 100 TB is bit-identical to
  * the oracle's replay — and to a re-run after adding data, for the
  * rows that existed before.
  */
object Pipeline {
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Hex-prefix threshold selector: md5 of the id's first two hex
    * chars are uniform over 256 values; `id_hex <= threshold` selects
    * a deterministic (threshold+1)/256 fraction. String-compare on
    * lowercase hex replays identically in any engine with md5. */
  private def hexBucket(id: org.apache.spark.sql.Column) =
    substring(md5(id.cast("string")), 1, 2)

  // train ≈ 204/256 (79.7%), val ≈ 26/256 (10.2%), test ≈ 26/256
  private def splitOf(id: org.apache.spark.sql.Column) = {
    val h = hexBucket(id)
    when(h <= "cb", "train").when(h <= "e5", "val").otherwise("test")
  }

  /** ONE 64-token chunk-fingerprint table behind x15 and x26 (the
    * chunk rule must not fork between the doc-grain and source-grain
    * reports). Materialized once: the explode feeds BOTH the
    * fingerprint-frequency aggregation and the join back (the x13/Pq
    * lesson — without this the tokenize+md5 subtree runs twice per
    * query). Columns: (doc_id, source, fp). */
  private def chunkFps(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), explode(transform(
        sequence(lit(0), ((size(col("toks")) - 1) / 64).cast("int")),
        c => md5(array_join(
          slice(col("toks"), c * 64 + 1, lit(64)), " ")))).as("fp"))
      .localCheckpoint()

  /** The same chunk table as SQL — shared by the x15/x26 oracles. */
  private val chunkSql =
    """SELECT doc_id, source,
         md5(array_to_string(toks[c*64+1 : c*64+64], ' ')) AS fp
       FROM (SELECT doc_id, source,
           string_split_regex(trim(text), '\s+') AS toks
         FROM documents) tk,
         unnest(range(0, (len(toks)-1)//64 + 1)) AS u(c)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reproducible train/val/test split: assignment is a pure function
    // of doc_id (md5 hex prefix vs threshold), so it's stable across
    // cluster sizes, re-runs and incremental corpus growth. Narrow,
    // shuffle-free scan + one small aggregation.
    "x1_hash_split" -> ((s, d) =>
      docs(s, d)
        .select(splitOf(col("doc_id")).as("split"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("split")),

    // Concat-and-chunk sequence packing: documents in doc_id order
    // form one token stream per shard; each document is assigned the
    // 2048-token context window containing its start offset. The
    // running sum is per-shard (PARTITION BY doc_id/10000), so packing
    // parallelizes across shards at 100 TB instead of funneling the
    // corpus through one globally-ordered window task.
    "x2_seq_packing" -> ((s, d) => {
      val shard = floor(col("doc_id") / 10000L)
      val w = Window.partitionBy(shard.as("shard")).orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, d)
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("off", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("n_tokens"),
          (shard * 1000000L + floor(col("off") / 2048L)).as("win"))
        .groupBy("win")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("win_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("win")
    }),

    // Weighted mixture sampling: per-source rates (100% / 50% / 12.5%
    // by source tier) via the same md5-threshold trick — deterministic
    // dataset mixing without an RNG seed to disagree about across
    // executors. Output is the realized mixture histogram.
    "x3_mixture_sample" -> ((s, d) => {
      val tier = substring(col("source"), 4, 10).cast("int")
      val threshold = when(tier < 5, "ff")
        .when(tier < 10, "7f").otherwise("1f")
      docs(s, d)
        .filter(hexBucket(col("doc_id")) <= threshold)
        .select(col("source"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"), sum("n_tokens").as("n_tokens"))
        .orderBy("source")
    }),

    // Dataset profile ("dataset card" stats): per-column row/null/
    // distinct counts and min/max. The ORACLE query uses the exact
    // variant (countDistinct replays in DuckDB); the DEFAULT published
    // API is profile() below — ONE aggregation pass over all columns
    // with approx_count_distinct (HLL++), the 100 TB shape.
    "x5_profile" -> ((s, d) =>
      profile(Tables.load(s, d, "lineitem"),
        Seq("l_orderkey", "l_returnflag", "l_shipdate"), approx = false)),

    // Leakage-safe split: near-duplicate documents must not straddle
    // train/test, so the split key is the duplicate CLUSTER head (d5's
    // connected components over MinHash-verified Jaccard ≥ 0.8 edges),
    // not the document — singletons are their own head. Composes the
    // dedup graph with the hash split; all bulk work is the banded
    // LSH join + O(log diameter) component rounds.
    "x4_cluster_split" -> ((s, d) => {
      val dd = docs(s, d)
      val comp = Dedup.connectedComponents(
        Dedup.minhashVerifiedPairs(dd, 0.8,
          layout = Dedup.lshLayoutOf(s, d)).select("i", "j"))
      dd.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster"))
        .withColumn("split", splitOf(col("cluster")))
        .orderBy("doc_id")
    }),

    // Eval-set decontamination: flag corpus documents sharing any
    // 5-token shingle with the benchmark/eval suite (doc_id < 20
    // stands in for it). Scale shape: the eval side is tiny BY
    // CONSTRUCTION — eval suites are thousands of documents, not TB —
    // so its distinct shingle set broadcasts; the corpus side is a
    // narrow scan + explode feeding a broadcast hash join (no corpus
    // shuffle) and a per-doc count.
    "x6_decontaminate" -> ((s, d) => {
      val dd = docs(s, d)
      val sh = dd.select(col("doc_id"),
        explode(shingles(col("text"), 5)).as("s"))
      val ev = sh.filter(col("doc_id") < 20).select("s").distinct()
        .withColumn("hit", lit(1L))
      val counts = sh.filter(col("doc_id") >= 20)
        .join(broadcast(ev), Seq("s"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      // join back so even a doc too short to shingle reports 0
      dd.filter(col("doc_id") >= 20).select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") > 0)
        .orderBy("doc_id")
    }),

    // End-to-end corpus assembly — the operators above COMPOSED the way
    // a real pre-training pipeline chains them: exact dedup (keep the
    // lowest doc_id per fingerprint) → quality cut (t2's score ≥ 0.5)
    // → eval-set decontamination (x6's shingle rule) → reproducible
    // split (x1's md5 threshold), reporting per-split doc/token counts.
    // Every stage keeps its scale shape: dedup is one hash aggregation,
    // quality is a per-row expression, decontamination broadcasts the
    // eval shingles, the split is a pure function — so the composition
    // is exactly one corpus-keyed shuffle per set-operation, no
    // collect, no new machinery.
    "x8_clean_corpus" -> ((s, d) => cleanCorpus(docs(s, d))),

    // Token-budget mixture planning: given per-source token counts and
    // tier weights, compute each source's target token allocation under
    // a fixed training budget, the sampling rate to hit it (capped at
    // 1 — can't sample more than exists without repeating), and the
    // epoch count when the target EXCEEDS the source (capped at 3 —
    // the usual repeat-data guardrail). One groupBy(source) aggregation
    // plus a one-row broadcast of the weight total: trivially scale-
    // safe, and every number is a deterministic function of the corpus.
    "x9_mixture_plan" -> ((s, d) => {
      val budget = lit(100000.0)
      val tier = substring(col("source"), 4, 10).cast("int")
      val w = when(tier < 5, 4.0).when(tier < 10, 2.0).otherwise(1.0)
      val per = docs(s, d)
        .select(col("source"), tokenCount(col("text")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("n_tokens"))
        .withColumn("weight", w)
      val tot = per.agg(sum("weight").as("wsum"))
      per.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          round(budget * col("weight") / col("wsum"), 0).cast("long"))
        .withColumn("ratio",
          col("target_tokens").cast("double") / col("n_tokens"))
        .select(col("source"), col("n_tokens"), col("weight"),
          col("target_tokens"),
          round(least(lit(1.0), col("ratio")), 6).as("rate"),
          // passes over the source: 1 when undersampling (rate < 1
          // does the thinning), up to 3 when the target exceeds it
          round(greatest(lit(1.0), least(lit(3.0), col("ratio"))), 6)
            .as("epochs"))
        .orderBy("source")
    }),

    // Chunk-grain quality SURGERY — doc-level filtering (x8) throws
    // away salvageable documents wholesale; the production refinement
    // (C4's line-level filtering, at this corpus's 64-token chunk
    // grain since it has no line structure) scores each chunk and
    // keeps the good ones: a doc is kept in full, kept partially
    // (surgery), or dropped. Per doc: chunk counts, kept-token mass
    // and the status — the report that prices surgery against
    // doc-level filtering. Threshold 0.5 sits mid-distribution
    // (chunk quality spans 0.30–0.74 here), so all three statuses
    // occur at every scale. On THIS corpus the live surgery direction
    // is trimming junk chunks out of docs the doc-level cut keeps
    // (the converse — recovering good chunks from dropped docs — is
    // structurally dead here: low-q docs are short single-chunk docs
    // or uniformly low; measured 0 recovered at every sf). Chunk rule shared with x12/x15 (64-token
    // windows); quality is t2's rounded form per chunk. One explode +
    // one doc-grain aggregation — no joins, no corpus shuffle beyond
    // the chunk rows themselves.
    "x33_chunk_filter" -> ((s, d) => {
      val ch = docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), ((size(col("toks")) - 1) / 64).cast("int")),
          c => slice(col("toks"), c * 64 + 1, lit(64)))).as("ctoks"))
      ch.select(col("doc_id"), size(col("ctoks")).cast("long").as("nt"),
          (round(qualityScore(array_join(col("ctoks"), " ")), 4) >= 0.5)
            .as("keep"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("nt")).otherwise(0L)).as("tokens_kept"))
        .withColumn("status",
          when(col("n_kept") === 0, "drop")
            .when(col("n_kept") === col("n_chunks"), "full")
            .otherwise("partial"))
        .orderBy("doc_id")
    }),

    // Filter ABLATION matrix — x19's funnel shows stage-sequential
    // attrition, which hides redundancy: a rule that only ever fails
    // docs other rules already fail adds nothing but risk. Per rule
    // (t18's length band, x8's quality cut, a >=2-distinct-stopword
    // minimum over the repo stopword list, a mean-word-length band
    // tuned to this corpus's 3.7–5.3 range so it actually separates):
    // total failures AND unique
    // failures (docs failing ONLY that rule) with the unique token
    // loss — the numbers that decide whether a filter earns its place.
    // One scan, one wide aggregation, a 4-row explode; every figure is
    // an exact integer (the only doubles — quality and mean word
    // length — are the repo's established rounded/single-division
    // forms). Rules share t18/t2's exact SQL twins.
    "x32_filter_ablation" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nW = size(toks).cast("long")
      val nChars = length(
        regexp_replace(col("text"), "[ \\t\\n\\r\\f]", "")).cast("double")
      val stopList = array(
        graft.functions.TextFunctions.StopWords.map(lit): _*)
      val nStop = size(array_intersect(
        array_distinct(transform(toks, t => lower(t))), stopList))
      val f = docs(s, d).select(nW.as("nt"),
        nW.between(50L, 100000L).as("p_len"),
        (round(qualityScore(col("text")), 4) >= 0.5).as("p_quality"),
        (nStop >= 2).as("p_stop"),
        (nChars / nW.cast("double")).between(3.8, 5.0).as("p_wordlen"))
      val rules = Seq("len", "quality", "stop", "wordlen")
      def pass(r: String) = col(s"p_$r")
      def onlyFail(r: String) =
        rules.filter(_ != r).map(pass).reduce(_ && _) && !pass(r)
      val aggs = rules.flatMap { r =>
        Seq(sum(when(!pass(r), 1L).otherwise(0L)).as(s"f_$r"),
          sum(when(onlyFail(r), 1L).otherwise(0L)).as(s"o_$r"),
          sum(when(onlyFail(r), col("nt")).otherwise(0L)).as(s"t_$r"))
      } :+ count(lit(1)).as("nd")
      f.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rules.map { r =>
          struct(lit(r).as("rule"), col(s"f_$r").as("n_fail"),
            col(s"o_$r").as("n_fail_only"), col(s"t_$r").as("tokens_only"),
            expr(s"f_$r * 10000 div nd").as("fail_bp"))
        }: _*)).as("r"))
        .select("r.*")
        .orderBy("rule")
    }),

    // Train/eval SPLIT LEAKAGE audit — x6 decontaminates against an
    // EXTERNAL eval set; this is the internal twin every pipeline also
    // needs: after x1's hash split, does any val/test document share
    // an 8-token shingle with ANY train document? (A leaked shingle
    // means the eval metric partially scores memorization.) The %97
    // duplicated-document fixture (copies at +9100000 whose split is
    // re-drawn from the new id) guarantees the positive branch at
    // every scale; organic near-dups straddling the split boundary
    // leak too (both observed at sf0.001/0.01/0.1). Scale shape: the
    // train shingle set is corpus-sized — NOT broadcast; the
    // membership probe is a shuffled left join keyed by the shingle
    // itself, i.e. the same distributed semi-join d2's index uses, and
    // everything after it is doc-grain aggregation.
    "x30_split_leakage" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), col("text"))
      val all = base.unionByName(base.filter(col("doc_id") % 97 === 2)
        .select((col("doc_id") + 9100000L).as("doc_id"), col("text")))
      val dd = all.select(col("doc_id"), splitOf(col("doc_id")).as("split"),
        col("text"))
      val sh = dd.select(col("doc_id"), col("split"),
        explode(shingles(col("text"), 8)).as("g"))
      val train = sh.filter(col("split") === "train")
        .select(col("g")).distinct().withColumn("hit", lit(1L))
      val hits = sh.filter(col("split") =!= "train")
        .join(train, Seq("g"), "left")
        .groupBy("doc_id", "split")
        .agg(max(coalesce(col("hit"), lit(0L))).as("leaked"))
      dd.filter(col("split") =!= "train").select("doc_id", "split")
        .join(hits, Seq("doc_id", "split"), "left")
        .select(col("split"), coalesce(col("leaked"), lit(0L)).as("leaked"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("leaked").as("n_leaked"))
        .withColumn("leak_bp", expr("n_leaked * 10000 div n_docs"))
        .orderBy("split")
    }),

    // Data-constrained epoch plan (Muennighoff et al., "Scaling
    // Data-Constrained Language Models": repeating data beyond ~4
    // epochs adds almost no value): given a token budget of half the
    // corpus split EQUALLY across sources, each source absorbs at most
    // 4 epochs of itself — small sources hit the epoch ceiling and
    // return the surplus as a published deficit (the signal to go
    // crawl more of that source, not to repeat it a 5th time). The
    // 'src_tail' fixture source (docs 1 and 98 — a freshly-onboarded
    // source with two crawled documents, ≈0.4% of the corpus, present
    // at every sf) deterministically exercises the ceiling branch;
    // the 20 uniform real sources (~5% each vs a ~2.4% budget) stay
    // under it. All-integer arithmetic (div, least) —
    // bit-exact in both engines. One aggregation over sources + a
    // broadcast scalar: scan-speed at any corpus size.
    "x31_epoch_plan" -> ((s, d) => {
      val base = docs(s, d).select(col("source"), col("text"))
      val tail = docs(s, d)
        .filter(col("doc_id") === 1 || col("doc_id") === 98)
        .select(lit("src_tail").as("source"), col("text"))
      val src = base.unionByName(tail)
        .select(col("source"), tokenCount(col("text")).cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("n_tokens"))
      val tot = src.agg(sum("n_tokens").as("tt"), count(lit(1)).as("ns"))
      src.crossJoin(broadcast(tot))
        .withColumn("budget", expr("tt div 2 div ns"))
        .withColumn("alloc_tokens",
          least(col("budget"), col("n_tokens") * 4))
        .select(col("source"), col("n_tokens"), col("alloc_tokens"),
          expr("alloc_tokens * 10000 div n_tokens").as("epochs_bp"),
          (col("budget") - col("alloc_tokens")).as("deficit"))
        .orderBy("source")
    }),

    // Temperature-smoothed mixture weights (the multilingual/
    // multi-source sampling standard): w_i ∝ p_i^τ flattens dominant
    // sources and lifts the tail. τ = 0.5 is DELIBERATE: the power is
    // then sqrt, which IEEE-754 requires correctly rounded in every
    // engine — pow(x, 0.7) is not, and would diverge at the last ulp.
    // The weight NORMALIZER folds in sorted-source order (collect +
    // array_sort + left fold — sources are a bounded set by nature;
    // the t8 list_sum pattern), so the published shares are raw
    // doubles that replay bitwise.
    "x29_mixture_temperature" -> ((s, d) => {
      val per = docs(s, d)
        .select(col("source"), tokenCount(col("text")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("n_tokens"))
      val tot = per.agg(sum("n_tokens").as("t"))
      val j = per.crossJoin(broadcast(tot))
        .withColumn("p",
          col("n_tokens").cast("double") / col("t").cast("double"))
        .withColumn("w", sqrt(col("p")))
      val ws = j.agg(aggregate(
        transform(array_sort(collect_list(struct(col("source"), col("w")))),
          x => x.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("ws"))
      j.crossJoin(broadcast(ws))
        .select(col("source"), col("n_tokens"), col("p"), col("w"),
          (col("w") / col("ws")).as("share"))
        .orderBy("source")
    }),

    // Post-dedup mixture replanning: dedup changes each source's
    // EFFECTIVE token supply (boilerplate-heavy sources lose the
    // most), so the x9 allocation must be recomputed over KEPT tokens
    // or the sampler silently over-draws deduped sources. Per source:
    // raw vs kept tokens under d1's keeper rule (min doc_id per
    // fingerprint), integer-bp loss, then x9's tier-weight allocation
    // re-run on the kept supply. Scale shape: the fingerprint
    // keeper join is d1's (hash groupBy, no corpus sort), the rest is
    // one groupBy(source) + a broadcast one-row weight total; rate
    // divides by the ROUNDED integer target like x9, with a
    // greatest(kept,1) guard applied identically in both engines.
    // The %97 "re-crawl" union is d11's fixture rule: the synthetic
    // corpus has ZERO organic exact-dup docs at sf0.01, so without it
    // the loss branch would never fire at the gate scale.
    "x28_dedup_replan" -> ((s, d) => {
      val budget = lit(100000.0)
      val tier = substring(col("source"), 4, 10).cast("int")
      val w = when(tier < 5, 4.0).when(tier < 10, 2.0).otherwise(1.0)
      val raw = docs(s, d).select(col("doc_id"), col("source"), col("text"))
      val corpus = raw.unionByName(raw.filter(col("doc_id") % 97 === 1)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      // materialized once: referenced by BOTH sides of the keeper
      // join (the x13 rule) — without it every run fingerprints and
      // tokenizes the corpus twice
      val dd = corpus.select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n"),
        fingerprint(col("text")).as("fp"))
        .localCheckpoint()
      val keep = dd.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
      val per = dd.join(keep, "fp")
        .withColumn("kept", col("doc_id") === col("keep_id"))
        .groupBy("source").agg(
          sum(col("n")).as("n_raw"),
          sum(when(col("kept"), col("n")).otherwise(0L)).as("n_kept"))
        .withColumn("weight", w)
      val tot = per.agg(sum("weight").as("wsum"))
      per.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          round(budget * col("weight") / col("wsum"), 0).cast("long"))
        .select(col("source"), col("n_raw"), col("n_kept"),
          expr("(n_raw - n_kept) * 10000 div n_raw").as("loss_bp"),
          col("target_tokens"),
          round(least(lit(1.0), col("target_tokens").cast("double") /
            greatest(col("n_kept"), lit(1L)).cast("double")), 6).as("rate"))
        .orderBy("source")
    }),

    // Deterministic epoch shuffle: training-order randomization as a
    // pure function of (epoch seed, doc_id) — an md5 sort key, so
    // epoch k replays bit-identically on any cluster size. The shard
    // is the key's first hex byte (256 uniform buckets): writing
    // shard-by-shard, each internally key-sorted, IS the scalable
    // shuffle shape — one balanced range-style exchange, no global
    // sort funnel, and readers stream shards in order.
    "x7_epoch_shuffle" -> ((s, d) => {
      val key = md5(concat(lit("epoch7:"), col("doc_id").cast("string")))
      docs(s, d).select(col("doc_id"), key.as("shuffle_key"),
        conv(substring(key, 1, 2), 16, 10).cast("long").as("shard"))
        .orderBy("shuffle_key")
    }),

    // Per-source document cap (domain balancing, the RefinedWeb-style
    // rule): keep at most 10 docs per source, chosen by md5(doc_id)
    // order — deterministic and stable under corpus growth (a doc's
    // keep flag flips only if lower-hash docs later arrive in its
    // source). The rank comes from the k-bounded TopKByScore heap
    // aggregate, NOT a window: a mega-domain (the 100 TB hazard — one
    // host with billions of pages funneling into a single window task)
    // costs each map task O(k) and the exchange moves k-sized partial
    // states, never the domain's rows. Rank key = first 13 md5 hex
    // chars as an integer: 52 bits, exact in the aggregate's double
    // score; fixed-length lowercase hex means string order == numeric
    // order, so the oracle ranks by the substring directly. Ties (key
    // collision) break by doc_id in both engines.
    "x10_source_cap" -> ((s, d) => {
      val key = conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long")
      docs(s, d)
        .select(col("source"), col("doc_id"), key.as("k"))
        .groupBy("source")
        .agg(graft.functions.expressions.TopK
          .topKByScore(-col("k").cast("double"), col("doc_id"), 10)
          .as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("t.id").as("doc_id"))
        .orderBy("source", "rk")
    }),

    // Contaminated-span REMOVAL — the surgery step after x6's flag:
    // instead of dropping a contaminated document wholesale, cut the
    // contaminated windows (each eval-matching 5-gram ± a 2-token
    // margin, overlaps merged) and keep the clean segments as training
    // text (the GPT-3-appendix-C-style treatment). Positions are
    // integers end to end, so the oracle replays exactly. Scale shape:
    // the eval shingle set broadcasts (eval suites are tiny by
    // nature), hit detection is a broadcast semi-join on the positional
    // shingle explode, and interval-merge/segment windows partition by
    // doc_id — per-document state only, no corpus-wide window. Output
    // is one row per KEPT segment; a fully contaminated doc emits
    // nothing, an untouched doc emits one whole-doc segment.
    "x11_decontam_clean" -> ((s, d) => decontamClean(docs(s, d))),

    // Retrieval-style chunking: overlapping 64-token windows with
    // stride 48 (16-token overlap carries context across boundaries) —
    // the document→chunk step of a RAG / context-window pipeline.
    // Chunk boundaries are pure integer arithmetic on the token index,
    // so chunk identity is stable across cluster size and re-runs, and
    // the oracle replays it exactly. Scale shape: per-row explode of
    // ≤ ceil(n/48) chunk ids then slice/concat — no shuffle beyond the
    // output ORDER BY, ~1.33× token inflation by construction.
    "x12_chunking" -> ((s, d) => {
      val (w, st) = (64, 48)
      docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("n_chunks", when(col("n") <= w, lit(1L)).otherwise(
          lit(1L) + ceil((col("n") - w).cast("double") / st).cast("long")))
        .select(col("doc_id"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"),
          col("toks"), col("n"))
        .select(col("doc_id"), col("chunk_id"),
          concat_ws(" ",
            slice(col("toks"), (col("chunk_id") * st + 1).cast("int"),
              lit(w))).as("chunk_text"),
          least(lit(w.toLong), col("n") - col("chunk_id") * st)
            .as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Cluster-balanced sampling (the unsupervised twin of x3's
    // source-tier mixture): text → hashed-feature vectors (the t11
    // featurizer) → k-means domains (the v11 trainer) → per-domain
    // md5-threshold rates that level every domain to the SMALLEST
    // domain's mass. No labels needed — the DoReMi/SemDeDup-style
    // rebalance entirely in-engine. Determinism: features, clustering
    // and the sampling key are all md5/argmax functions of content,
    // so the sample replays bit-identically at any cluster size.
    // Published as invariants (cluster sizes are corpus facts, not
    // constants): every domain's sampled mass lands within wide
    // tolerance of the target, and samples are subsets.
    "x13_domain_mixture" -> ((s, d) => {
      val k = 4
      val bks = transform(tokens(col("text")),
        t => pmod(conv(substring(md5(t), 1, 13), 16, 10).cast("long"),
          lit(64L)))
      // L2-NORMALIZED hashed-feature vectors: the trainer assigns by
      // argmax dot, so unnormalized count vectors degenerate to
      // longest-doc-wins (one mega-cluster — observed); on the unit
      // sphere argmax dot IS spherical k-means by direction
      val raw = docs(s, d).select(col("doc_id").as("vec_id"),
        graft.functions.expressions.Kernels.bucketCounts(bks, 64)
          .cast("array<double>").as("v"))
      val feats = raw
        .withColumn("nrm", greatest(
          graft.functions.VectorFunctions.norm(
            col("v").cast("array<float>")), lit(1e-9)))
        .select(col("vec_id"),
          transform(col("v"), x => x / col("nrm"))
            .cast("array<float>").as("embedding"))
        // materialize ONCE: every Lloyd iteration (and the init
        // collect, the final assignment, and the sampling below)
        // re-executes this subtree otherwise — tokenize + per-token
        // md5 across the corpus ~10×, measured 161 s vs ~2 s at sf0.1.
        // Same treatment as Pq's sample; at 100 TB the featurized
        // table is the thing to persist, not recompute.
        .localCheckpoint()
      val (assigned, _) = Ivf.fit(feats, k, iters = 3)
      val sizes = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n"))
      val target = sizes.agg(min(col("n"))).first().getLong(0)
      val rated = assigned.join(broadcast(sizes), "cluster")
        .withColumn("rate", least(lit(1.0), lit(target.toDouble) / col("n")))
        // 13-hex md5 prefix / 16^13 is uniform in [0,1): doc kept iff
        // below its domain's rate — deterministic, growth-stable
        .withColumn("u",
          conv(substring(md5(col("vec_id").cast("string")), 1, 13), 16, 10)
            .cast("double") / math.pow(16.0, 13))
        .withColumn("kept", col("u") < col("rate"))
      val perCluster = rated.groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      // single invariant row (cluster population is a corpus fact, not
      // an oracle constant): every domain's sample is a subset and
      // levels to the smallest domain's mass. The tolerance is
      // binomial-aware, not a bare ratio: n_kept ~ Binom(n, target/n)
      // has σ ≈ √target, so a FIXED ±60% band flakes when k-means
      // hands back a small smallest-domain (target = 10 → ±6σ events
      // at percent-level probability). Band = ±max(0.6·target, 6√target)
      // keeps the invariant deterministic-in-practice (≥ 6σ) at every
      // domain size while still asserting real leveling.
      val slack = math.max(0.6 * target, 6.0 * math.sqrt(target.toDouble))
      perCluster.agg(
        (count(lit(1)) >= 2).as("multi_domain"),
        (max(when(col("n_kept") > col("n"), 1).otherwise(0)) === 0)
          .as("subset_ok"),
        (max(when(col("n_kept") < lit(target - slack) ||
            col("n_kept") > lit(target + slack), 1).otherwise(0)) === 0)
          .as("balanced_ok"))
    }),

    // Chunk-level (paragraph-granularity) dedup audit: fingerprint
    // NON-overlapping 64-token chunks, count each fingerprint across
    // the corpus, report per-doc duplicated-chunk fraction — the
    // dedup signal BETWEEN d1's whole-doc exact and d6/d8's span
    // level: a doc that is 40% verbatim-recycled paragraphs scores
    // 0.4 here while passing whole-doc dedup. One chunk explode
    // (~n_tokens/64 rows per doc), one fingerprint-keyed count, one
    // join back — all linear, no self-join anywhere.
    "x15_chunk_dedup" -> ((s, d) => {
      val chunks = chunkFps(s, d)
      val dfreq = chunks.groupBy("fp").agg(count(lit(1)).as("n"))
      chunks.join(dfreq, "fp")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup"),
          round(col("n_dup").cast("double") / col("n_chunks"), 4)
            .as("dup_frac"))
        .orderBy("doc_id")
    }),

    // Per-SOURCE duplication report — the data-vendor quality rollup
    // of x15: for each source, chunk counts, chunks duplicated
    // anywhere in the corpus (cross-source attribution is the point —
    // a vendor re-selling another's crawl shows up here), and the
    // rate in basis points. Same materialize-once chunk table as x15,
    // corpus-wide frequency join, one extra aggregation to source
    // grain; all-integer published values.
    "x26_source_dup_report" -> ((s, d) => {
      val chunks = chunkFps(s, d)
      val dfreq = chunks.groupBy("fp").agg(count(lit(1)).as("n"))
      chunks.join(dfreq, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("source"), col("n_chunks"), col("n_dup"),
          expr("n_dup * 10000 div n_chunks").as("dup_bp"))
        .orderBy("source")
    }),

    // Population-stability-index drift report (the model-monitoring
    // PSI, worn as corpus governance): per source, how far its
    // quality-score distribution sits from the REST of the corpus,
    // over 10 fixed [0,1] decile bins with add-0.5 smoothing (no
    // empty-bin ln(0)). Scale shape: ONE binned aggregation per
    // source (10 integer count columns — bins never shuffle
    // separately) plus one broadcast corpus-total row; psi folds the
    // 10 bins in fixed left-assoc order from integer counts, so the
    // published raw double replays bit-for-bit. The PSI > 0.25
    // "significant shift" textbook flag is published as a boolean.
    "x27_psi_drift" -> ((s, d) => {
      val binned = docs(s, d).select(col("source"),
          qualityScore(col("text")).as("q"))
        .withColumn("bin",
          least(floor(col("q") * 10.0), lit(9.0)).cast("int"))
      def binCounts(prefix: String) = (0 until 10).map(i =>
        sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"$prefix$i"))
      val perSrc = binned.groupBy("source")
        .agg(count(lit(1)).as("n_s"), binCounts("c"): _*)
        .localCheckpoint() // referenced by tot AND the final join
      // the corpus totals are the COLUMN SUMS of perSrc (sources
      // partition the corpus) — derived, not a second corpus scan
      val tot = perSrc.agg(sum(col("n_s")).as("n_tot"),
        (0 until 10).map(i => sum(col(s"c$i")).as(s"t$i")): _*)
      val psi = (0 until 10).map { i =>
        val p = (col(s"c$i").cast("double") + lit(0.5)) /
          (col("n_s").cast("double") + lit(5.0))
        val r = ((col(s"t$i") - col(s"c$i")).cast("double") + lit(0.5)) /
          ((col("n_tot") - col("n_s")).cast("double") + lit(5.0))
        (p - r) * log(p / r)
      }.reduce(_ + _)
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_s").as("n_docs"), psi.as("psi"))
        .withColumn("shifted", col("psi") > 0.25)
        .orderBy("source")
    }),

    // DSIR-style importance selection (Xie et al. 2023, "Data
    // Selection via Importance Resampling" — unigram variant): score
    // each corpus doc by the mean token log-likelihood RATIO between
    // the target distribution (the eval/domain exemplar docs,
    // doc_id < 20 — the x6 convention) and the corpus distribution,
    // add-0.5 smoothed over the joint vocabulary; keep docs scoring
    // above 0 (more target-like than corpus-like). The scale shape is
    // t8's: both count tables are vocabulary-bounded, the ratio model
    // joins UNHINTED (AQE sizes it), the one-row stat table
    // broadcasts, and the per-doc mean folds in token order
    // (bit-replayable sum). The tiny target side is corpus-priced:
    // a 20-doc exemplar set versus a 100 TB corpus is the real
    // regime, and nothing here scales with the target.
    "x16_dsir_select" -> ((s, d) => {
      // materialized once: the token table feeds the corpus counts,
      // the target counts AND the scoring join — three corpus-wide
      // tokenize passes otherwise (the x13 lesson)
      val toks = docs(s, d).select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .localCheckpoint()
      val isEval = col("doc_id") < 20
      val cFreq = toks.filter(!isEval).groupBy("tok")
        .agg(count(lit(1)).cast("double").as("cc"))
      val tFreq = toks.filter(isEval).groupBy("tok")
        .agg(count(lit(1)).cast("double").as("tc"))
      val vocab = cFreq.join(tFreq, Seq("tok"), "full_outer")
        .select(col("tok"), coalesce(col("cc"), lit(0.0)).as("cc"),
          coalesce(col("tc"), lit(0.0)).as("tc"))
      val stats = vocab.agg(sum(col("cc")).as("ct"),
        sum(col("tc")).as("tt"), count(lit(1)).cast("double").as("vn"))
      toks.filter(!isEval)
        .join(vocab, "tok")
        .crossJoin(broadcast(stats))
        .withColumn("lr",
          log((col("tc") + 0.5) / (col("tt") + col("vn") * 0.5)) -
            log((col("cc") + 0.5) / (col("ct") + col("vn") * 0.5)))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("lr"))))
          .as("ps"))
        // Signed-zero trap (the round-8 red row): a raw score in
        // (-5e-5, 0) rounds to ZERO at 4dp, and Spark's Round (a
        // BigDecimal route, which has no signed zero) publishes +0.0
        // while DuckDB's float round keeps the sign and publishes
        // -0.0 — a hash mismatch on bit-compared doubles. The oracle
        // adds `+ 0.0` (IEEE: -0.0 + 0.0 = +0.0) to match. NOT a
        // half-way tie: the diff showed every raw score ≥ 4e-3 grid
        // cells away from a 4dp boundary; doc 52's raw -4.4e-5 was
        // the one straddler.
        .select(col("doc_id"), round(
          graft.functions.expressions.Kernels.structDoubleSum(col("ps"), 1)
            / size(col("ps")), 4).as("dsir"))
        .withColumn("kept", col("dsir") > 0.0)
        .orderBy("doc_id")
    }),

    // Token-budget curation (the data-constrained-scaling step: a
    // fixed training budget buys the highest-quality prefix): keep
    // docs in (quality desc, doc_id asc) order while the running
    // token total fits B = 30% of corpus tokens — greedy prefix, no
    // knapsack. Scale shape: NO corpus-wide sort. Quality is
    // 4dp-rounded, so the level table is bounded (≤ 10⁴+1 rows): level
    // masses aggregate in one pass, the boundary level is found on
    // that bounded table, whole levels keep/drop wholesale, and only
    // the ONE boundary level pays a per-doc running sum — a sharded
    // two-level prefix over that level's slice (see below), never one
    // task and never the corpus. The oracle replays
    // the same rule as the corpus-wide window cumsum (the shape this
    // plan exists to avoid); both reduce to identical integer
    // comparisons, so the equivalence is exact.
    "x17_token_budget" -> ((s, d) => {
      val dd = docs(s, d).select(col("doc_id"),
          round(qualityScore(col("text")), 4).as("quality"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .localCheckpoint() // feeds budget, levels AND the final union
      val budget = dd.agg(sum(col("n_tokens"))).head().getLong(0) * 3 / 10
      tokenBudgetSelect(dd, budget)
    }),

    // Filter-attribution funnel ("why was this doc dropped") — the
    // lineage table curation teams actually ship: each corpus doc
    // annotated with every x8-pipeline rule it trips (exact-dup
    // non-survivor, quality < 0.5, eval contamination, Gopher rules)
    // plus the flag count and the final keep verdict. Pure
    // COMPOSITION: each rule is the registered operator's own body
    // (d1's fingerprint survivorship, t2's quality, x6's shingle
    // rule, t18's keep), joined on doc_id — four linear passes, no
    // new machinery, and the oracle rebuilds the same four rules.
    "x19_filter_funnel" -> ((s, d) => {
      val dd = docs(s, d)
      val fp = dd.select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .localCheckpoint() // read by the survivor agg AND the join back
      val surv = fp.groupBy("fp").agg(min("doc_id").as("keep_id"))
      val dup = fp.join(surv, "fp")
        .select(col("doc_id"),
          (col("doc_id") =!= col("keep_id")).as("dup_exact"))
      val lowq = dd.select(col("doc_id"),
        (round(qualityScore(col("text")), 4) < 0.5).as("low_quality"))
      val contam = queries("x6_decontaminate")(s, d)
        .select(col("doc_id"), col("contaminated"))
      val gopher = TextOps.queries("t18_gopher_rules")(s, d)
        .select(col("doc_id"), (!col("keep")).as("gopher_fail"))
      dd.filter(col("doc_id") >= 20).select("doc_id")
        .join(dup, "doc_id").join(lowq, "doc_id")
        .join(contam, "doc_id").join(gopher, "doc_id")
        .withColumn("n_flags",
          col("dup_exact").cast("long") + col("low_quality").cast("long") +
            col("contaminated").cast("long") + col("gopher_fail").cast("long"))
        .withColumn("kept", col("n_flags") === 0L)
        .orderBy("doc_id")
    }),

    // Dataset card (per-source corpus report) — the standard release
    // table every corpus ships: per source, doc/token counts, mean
    // quality, language coverage, and the exact-duplicate share.
    // Scale shape: ONE pass computes the per-doc features
    // (fingerprint, tokens, quality — all per-row codegen), the
    // corpus-wide fingerprint counts are a hash aggregation with
    // map-side partials joined back UNHINTED, and the report is a
    // per-source aggregation — no sort, no window, nothing
    // driver-side. The per-doc feature frame is checkpointed once so
    // fingerprints aren't computed for both the count and join sides
    // (the x13 rule).
    "x18_dataset_card" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), col("source"),
          col("lang"), fingerprint(col("text")).as("fp"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          round(qualityScore(col("text")), 4).as("q"))
        .localCheckpoint()
      val fpc = base.groupBy("fp").agg(count(lit(1)).as("nfp"))
      // avg_quality via an INTEGER mean: quality sits on the 1e-4
      // grid, so round(q*10000) is an exact per-doc integer and the
      // published mean is one division of exact integers — immune to
      // partition-order float-summation drift (avg of grid doubles
      // then round(.,4) is the recorded "never round intermediates"
      // parity trap: the mean can land on a half-way point)
      base.join(fpc, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(sum(round(col("q") * 10000).cast("long")).cast("double") /
            (count(lit(1)) * 10000), 4).as("avg_quality"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("nfp") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .orderBy("source")
    }),

    // Quality-curriculum ordering: clean-first training order — docs
    // band into 4 stages by the t2 quality score (fixed thresholds,
    // per-row, shuffle-free — NOT ntile, whose global sort funnels the
    // corpus through one ordering at 100 TB), and the training order
    // within a stage is the x7-style deterministic md5 shuffle key.
    // (stage, ord) IS the curriculum: a writer range-partitions on it
    // and readers stream stages in order. Band thresholds compare the
    // 4dp-ROUNDED score so both engines agree on every edge case.
    "x14_curriculum" -> ((s, d) => {
      val q = round(qualityScore(col("text")), 4)
      val stage = when(q >= 0.7, 0L).when(q >= 0.6, 1L)
        .when(q >= 0.5, 2L).otherwise(3L)
      val ord = md5(concat(lit("cur:"), col("doc_id").cast("string")))
      docs(s, d).select(col("doc_id"), q.as("quality"),
        stage.as("stage"), ord.as("ord"))
        .orderBy("stage", "ord")
    }),

    // Weighted priority sampling WITHOUT replacement (Efraimidis–
    // Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    // per-source k=10 sample where a doc's inclusion odds scale with
    // its length — the principled upgrade of x10's uniform cap for
    // size-biased curation (sampling bytes, not documents). Key
    // k_i = u^(1/w) selected via the equivalent log key ln(u)/w (top-k
    // by key desc ≡ largest u^(1/w); one ln + one IEEE-exact divide —
    // no pow, whose libm implementations disagree across engines).
    // u is exact by construction: a 52-bit md5 prefix + 0.5, divided
    // by 2^52 (both steps exact in double), so the only cross-engine
    // surface is ln itself — the t8/t13-proven parity. Scale shape =
    // x10's: the k-bounded TopKByScore heap makes a mega-source cost
    // each map task O(k), and the exchange moves k-sized states, never
    // the source's rows. Deterministic: the sample replays
    // bit-identically at any cluster size and is stable under corpus
    // growth (a kept doc is evicted only by a genuinely higher-key
    // arrival in its source).
    // Quality-threshold sweep (curation tooling): keep-rate curves —
    // for each candidate cutoff τ, how many docs/tokens survive
    // `quality ≥ τ`. The operator a curator runs BEFORE committing to
    // x17/x14's fixed thresholds. Scale shape = x17's level trick:
    // aggregate once onto the 4dp quality grid (≤ 10⁴+1 level rows),
    // then sweep thresholds over the LEVEL table (9 × 10⁴ tiny cross
    // join) — never docs × thresholds. All published numbers are
    // integers (thresholds as basis points, fraction as integer
    // floor-division bp) — no rounding-mode surface at all.
    "x21_threshold_sweep" -> ((s, d) => {
      val lv = docs(s, d)
        .select(round(qualityScore(col("text")), 4).as("q"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("q")
        .agg(count(lit(1)).as("nd"), sum("n_tokens").as("nt"))
        .withColumn("qi", round(col("q") * 10000).cast("long"))
      val taus = s.range(1).select(
        explode(sequence(lit(3000L), lit(7000L), lit(500L))).as("tau_bp"))
      val tot = lv.agg(sum("nd").as("td"))
      lv.crossJoin(broadcast(taus))
        .groupBy("tau_bp")
        .agg(sum(when(col("qi") >= col("tau_bp"), col("nd"))
          .otherwise(0L)).as("n_docs"),
          sum(when(col("qi") >= col("tau_bp"), col("nt"))
            .otherwise(0L)).as("n_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("tau_bp"), col("n_docs"), col("n_tokens"),
          expr("n_docs * 10000 div td").as("frac_bp"))
        .orderBy("tau_bp")
    }),

    // Packing-EFFICIENCY sweep — the report behind choosing a context
    // length: for each candidate window size, total windows, padding
    // tokens lost at shard tails (x2's per-shard streams pad only
    // their last window), and the padding rate in basis points. Two
    // bounded aggregations (shards, then 4 window sizes × shards) —
    // ALL-INTEGER arithmetic ((tok + w − 1) div w, no float ceil), so
    // the sweep is engine-exact by construction.
    "x25_pack_efficiency" -> ((s, d) => {
      val st = docs(s, d)
        .select(expr("doc_id div 10000").as("shard"),
          tokenCount(col("text")).cast("long").as("n"))
        .groupBy("shard").agg(sum("n").as("tok"))
      val ws = s.range(1).select(explode(array(
        lit(512L), lit(1024L), lit(2048L), lit(4096L))).as("w"))
      st.crossJoin(broadcast(ws))
        .withColumn("nw", expr("(tok + w - 1) div w"))
        .groupBy("w")
        .agg(sum("nw").as("n_windows"),
          sum(expr("nw * w - tok")).as("pad_tokens"),
          sum(expr("nw * w")).as("cap"))
        .select(col("w"), col("n_windows"), col("pad_tokens"),
          expr("pad_tokens * 10000 div cap").as("pad_bp"))
        .orderBy("w")
    }),

    // Corpus SNAPSHOT DIFF — dataset versioning for raw corpora (the
    // crawl-v1 → crawl-v2 changelog; arr31 is the same CDC shape for
    // array tables): two deterministic views of the corpus (v1 lacks
    // the %7 docs; v2 drops the %13 docs and revises the %11 texts)
    // diff by doc_id presence + content fingerprint. ONE full-outer
    // hash join on the id — linear, and emits added/removed/changed
    // rows ONLY (the arr31 lesson: never materialize the unchanged
    // majority, which at 100 TB is nearly everything).
    "x24_corpus_diff" -> ((s, d) => {
      val dd = docs(s, d)
      val v1 = dd.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), fingerprint(col("text")).as("fp1"))
      val v2 = dd.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("fp2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("fp1").isNull, "added")
            .when(col("fp2").isNull, "removed")
            .when(col("fp1") =!= col("fp2"), "changed").as("change"))
        .filter(col("change").isNotNull)
        .orderBy("doc_id")
    }),

    // N-gram NOVELTY score (the dedup-aware curation signal between
    // x6's eval-overlap and d2's pair detection): per candidate doc
    // (odd ids), the fraction of its distinct 5-gram shingles unseen
    // in the base half (even ids) — "how much genuinely new text does
    // this doc add?". Unlike x6 the reference side is CORPUS-sized, so
    // it is NOT broadcast: both sides shuffle on the shingle key (an
    // ordinary hash join that scales with the corpus), then one
    // aggregation back to doc grain. Rates in integer basis points.
    "x23_ngram_novelty" -> ((s, d) => {
      val sh = docs(s, d)
        .select(col("doc_id"), explode(shingles(col("text"), 5)).as("s"))
        .distinct()
      val base = sh.filter(col("doc_id") % 2 === 0).select("s").distinct()
        .withColumn("seen", lit(1L))
      sh.filter(col("doc_id") % 2 === 1)
        .join(base, Seq("s"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          expr("n_novel * 10000 div n_shingles").as("novelty_bp"))
        .orderBy("doc_id")
    }),

    // Contamination GOVERNANCE report — the per-split rollup of x6's
    // doc-level rule (the number a data card or eval-integrity review
    // actually asks for: "what fraction of each split overlaps the
    // eval set?"). Same scale shape as x6: the eval side is distinct
    // shingles of a fixed small set (broadcast), the corpus side is
    // one explode + hash aggregation, then a second aggregation over
    // splits. The rate is published in integer basis points (x21's
    // frac_bp idiom) — no float division reaches the hash compare.
    "x22_contamination_report" -> ((s, d) => {
      val dd = docs(s, d)
      val sh = dd.select(col("doc_id"), explode(shingles(col("text"), 5)).as("s"))
      val ev = sh.filter(col("doc_id") < 20).select("s").distinct()
        .withColumn("hit", lit(1L))
      val flags = sh.filter(col("doc_id") >= 20)
        .join(broadcast(ev), Seq("s"), "left")
        .groupBy("doc_id")
        .agg((sum(coalesce(col("hit"), lit(0L))) > 0).as("contam"))
      dd.filter(col("doc_id") >= 20)
        .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
        .join(flags, Seq("doc_id"), "left") // short docs: no shingles → 0
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(coalesce(col("contam"), lit(false)), 1L).otherwise(0L))
            .as("n_contaminated"))
        .select(col("split"), col("n_docs"), col("n_contaminated"),
          // integer div end-to-end (x25's rule): double '/' + floor
          // diverges from the oracle's exact // once the denominator
          // is large enough for the q·2⁻⁵³ error to cross an integer
          expr("n_contaminated * 10000 div n_docs").as("contam_bp"))
        .orderBy("split")
    }),

    "x20_priority_sample" -> ((s, d) => {
      val u = (conv(substring(md5(concat(lit("pri:"),
        col("doc_id").cast("string"))), 1, 13), 16, 10).cast("double") +
        lit(0.5)) / lit(4503599627370496.0) // 2^52
      val key = log(u) / greatest(col("n_chars"), lit(1L)).cast("double")
      val dd = docs(s, d)
      dd.select(col("source"), col("doc_id"), key.as("k"))
        .groupBy("source")
        .agg(graft.functions.expressions.TopK
          .topKByScore(col("k"), col("doc_id"), 10).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        // ranking/eviction used the RAW key; only the published copy
        // is rounded (the t8/x16 convention — Spark StrictMath.log and
        // DuckDB libm log differ by ~1 ulp, and 10 dp is far above
        // ulp noise while keys are irrational, i.e. never grid-tied)
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("t.id").as("doc_id"),
          round(col("t.score"), 10).as("pri_key"))
        // n_chars re-joined AFTER selection: the heap state stays
        // (score, id) pairs; the join side is ≤ k·|sources| rows
        .join(dd.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .select(col("source"), col("rk"), col("doc_id"),
          col("n_chars"), col("pri_key"))
        .orderBy("source", "rk")
    })
  )

  /** x17's selection core over a prepared (doc_id, quality,
    * n_tokens) frame — extracted so specs can drive adversarial
    * corpora (saturated single-level quality, multi-shard boundary
    * levels, zero budgets) that the fixed test corpus never produces.
    * See the x17 query comment for the level/boundary design.
    *
    * Precondition: `quality` must be NON-NULL and non-NaN (the x17
    * caller's `round(qualityScore, 4)` guarantees both) — a null
    * quality would fall into neither the boundary nor the
    * complement branch and silently vanish from the output. */
  private[graft] def tokenBudgetSelect(dd: DataFrame, budget: Long)
      : DataFrame = {

      val lvc = dd.groupBy("quality").agg(sum(col("n_tokens")).as("m"))
        .withColumn("cum", sum(col("m")).over(Window
          .orderBy(col("quality").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      // first level (quality desc) whose cumulative mass overflows:
      // a 1-row collect off the bounded level table
      val boundary = lvc.filter(col("cum") > budget)
        .orderBy(col("quality").desc).limit(1)
        .select(col("quality"), (col("cum") - col("m")).as("prior"))
        .collect().headOption
      val marked = boundary match {
        case None => dd.withColumn("kept", lit(true)) // corpus fits
        case Some(row) =>
          val qStar = row.getDouble(0)
          val prior = row.getLong(1)
          // exact running sum in doc_id order over the boundary level
          // WITHOUT one global window (quality can saturate at a
          // single 4dp value, making this level a large corpus
          // fraction): value-based shards preserve the order
          // ((shard asc, doc_id asc) ≡ doc_id asc), each shard
          // cumsums in parallel, and only the per-shard TOTALS — a
          // table 10⁴× smaller — pay a single-partition prefix pass.
          // The shard-prefix join is UNHINTED (the t8 lesson): AQE
          // broadcasts the usual tiny case and shuffles the
          // pathological one.
          val bnd0 = dd.filter(col("quality") === qStar)
            .withColumn("bshard", floor(col("doc_id") / 10000L))
          val wIn = Window.partitionBy("bshard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
          val wSh = Window.orderBy("bshard")
            .rowsBetween(Window.unboundedPreceding, -1)
          val shardPrefix = bnd0.groupBy("bshard")
            .agg(sum(col("n_tokens")).as("stot"))
            .withColumn("soff",
              coalesce(sum(col("stot")).over(wSh), lit(0L)))
            .select(col("bshard"), col("soff"))
          val bnd = bnd0
            .withColumn("cum_in", sum(col("n_tokens")).over(wIn))
            .join(shardPrefix, "bshard")
            .withColumn("kept",
              (col("soff") + col("cum_in") + prior) <= budget)
            .select(col("doc_id"), col("quality"), col("n_tokens"),
              col("kept"))
          dd.filter(col("quality") =!= qStar)
            .withColumn("kept", col("quality") > qStar)
            .unionByName(bnd)
      }
      marked.select(col("doc_id"), col("quality"), col("n_tokens"),
        col("kept")).orderBy("doc_id")
  }

  /** x11's body over an arbitrary (doc_id, text) frame — eval set =
    * doc_id < 20, corpus = the rest (the x6 convention). See the query
    * comment for the design. */
  private[graft] def decontamClean(docsDf: DataFrame): DataFrame = {
    {
      val base = docsDf
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
      def posShingles(df: DataFrame) = df.filter(col("n") >= 5)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1L), col("n") - 4), i =>
            struct(i.as("pos"),
              array_join(slice(col("toks"), i, lit(5)), " ").as("s"))))
            .as("u"))
        .select(col("doc_id"), col("u.pos").as("pos"), col("u.s").as("s"))
      val ev = posShingles(base.filter(col("doc_id") < 20))
        .select("s").distinct()
      val corpus = base.filter(col("doc_id") >= 20)
      val iv = posShingles(corpus)
        .join(broadcast(ev), Seq("s"), "left_semi")
        .join(corpus.select("doc_id", "n"), "doc_id")
        .select(col("doc_id"),
          greatest(lit(1L), col("pos") - 2).as("lo"),
          least(col("n") + 1, col("pos") + 7).as("hi"))
      val wOrd = Window.partitionBy("doc_id").orderBy("lo", "hi")
      val merged = iv
        .withColumn("pmax", max(col("hi"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nf",
          when(col("pmax").isNull || col("lo") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("nf"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(min("lo").as("lo_m"), max("hi").as("hi_m"))
      val wM = Window.partitionBy("doc_id").orderBy("lo_m")
      val gaps = merged
        .withColumn("seg_lo",
          coalesce(lag(col("hi_m"), 1).over(wM), lit(1L)))
        .select(col("doc_id"), col("seg_lo"), col("lo_m").as("seg_hi"))
      val tails = merged.groupBy("doc_id").agg(max("hi_m").as("seg_lo"))
        .join(corpus.select("doc_id", "n"), "doc_id")
        .select(col("doc_id"), col("seg_lo"), (col("n") + 1).as("seg_hi"))
      val untouched = corpus
        .join(merged.select("doc_id").distinct(), Seq("doc_id"),
          "left_anti")
        .select(col("doc_id"), lit(1L).as("seg_lo"),
          (col("n") + 1).as("seg_hi"))
      gaps.unionByName(tails).unionByName(untouched)
        .filter(col("seg_hi") > col("seg_lo"))
        .join(base.select("doc_id", "toks"), "doc_id")
        .withColumn("seg_idx", row_number()
          .over(Window.partitionBy("doc_id").orderBy("seg_lo"))
          .cast("long"))
        .select(col("doc_id"), col("seg_idx"),
          col("seg_lo").as("seg_start"),
          (col("seg_hi") - col("seg_lo")).as("seg_tokens"),
          array_join(slice(col("toks"), col("seg_lo").cast("int"),
            (col("seg_hi") - col("seg_lo")).cast("int")), " ")
            .as("seg_text"))
        .orderBy("doc_id", "seg_idx")
    }
  }

  /** The x8 composition over an arbitrary documents frame (doc_id,
    * text): exact dedup keeps the lowest doc_id per fingerprint, the
    * quality cut drops scores < 0.5, docs sharing a 5-shingle with the
    * eval suite (doc_id < 20) are decontaminated away, survivors get
    * the reproducible split. Per-split (n_docs, n_tokens). */
  def cleanCorpus(dd: DataFrame): DataFrame = {
    val keep = dd.select(col("doc_id"), fingerprint(col("text")).as("f"))
      .groupBy("f").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val quality = dd.filter(qualityScore(col("text")) >= 0.5)
      .select("doc_id")
    val sh = dd.select(col("doc_id"),
      explode(shingles(col("text"), 5)).as("s"))
    val ev = sh.filter(col("doc_id") < 20).select("s").distinct()
    val cont = sh.filter(col("doc_id") >= 20)
      .join(broadcast(ev), "s").select("doc_id").distinct()
    dd.filter(col("doc_id") >= 20)
      .join(keep, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"), "left_semi")
      .join(cont, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("split")
  }

  /** Dataset profile. `approx = true` (the DEFAULT) computes EVERY
    * column's stats in ONE aggregation pass — `approx_count_distinct`
    * (HLL++, `rsd` relative error) instead of exact distinct — so a
    * 100 TB dataset card costs one scan + one shuffle of constant-size
    * partial sketches, not one exact-distinct shuffle per column.
    * `approx = false` is the oracle-replayable exact variant: one
    * aggregation per column (exact COUNT DISTINCT forces its own
    * shuffle per column), unioned.
    * `quantiles` (approx mode only) folds per-column percentile
    * sketches into the SAME single pass — numeric columns report an
    * `array<double>` at the requested fractions, others null.
    * Returns (col_name, n, n_null, n_distinct, min_s, max_s
    * [, quantiles]). */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = true,
      rsd: Double = 0.01, quantiles: Seq[Double] = Nil): DataFrame = {
    require(quantiles.isEmpty || approx,
      "quantiles are fused into the one-pass approx profile only")
    if (approx) {
      def numeric(c: String) = df.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      val qArr = array(quantiles.map(lit): _*)
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
        approx_count_distinct(col(c), rsd).as(s"nd__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c")) ++
        (if (quantiles.nonEmpty && numeric(c))
          Seq(percentile_approx(col(c).cast("double"), qArr, lit(10000))
            .as(s"q__$c"))
         else Nil))
      val one = df.agg(count(lit(1)).as("n"), aggs: _*)
      // unpivot the single row to one output row per column
      val pieces = cols.map { c =>
        val base = Seq(lit(c).as("col_name"),
          col("n"), col(s"null__$c").as("n_null"),
          col(s"nd__$c").as("n_distinct"), col(s"min__$c").as("min_s"),
          col(s"max__$c").as("max_s"))
        val q =
          if (quantiles.isEmpty) Nil
          else if (numeric(c)) Seq(col(s"q__$c").as("quantiles"))
          else Seq(lit(null).cast("array<double>").as("quantiles"))
        struct(base ++ q: _*)
      }
      one.select(explode(array(pieces: _*)).as("p"))
        .select("p.*").orderBy("col_name")
    } else {
      def prof(c: String) = df.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
      cols.map(prof).reduce(_ unionByName _).orderBy("col_name")
    }
  }

  private val tokSql = """len(string_split_regex(trim(text), '\s+'))"""
  private val splitSql =
    """CASE WHEN substr(md5(CAST(%s AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
            WHEN substr(md5(CAST(%s AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
            ELSE 'test' END"""

  val oracles: Map[String, String] = Map(
    "x1_hash_split" ->
      s"""SELECT split, count(*) AS n_docs, sum(n_tokens)::bigint AS n_tokens
         FROM (SELECT ${splitSql.format("doc_id", "doc_id")} AS split,
                 $tokSql AS n_tokens FROM documents)
         GROUP BY split ORDER BY split""",
    "x2_seq_packing" ->
      s"""SELECT win, count(*) AS n_docs, sum(n_tokens)::bigint AS win_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM (SELECT doc_id, n_tokens,
             (doc_id // 10000) * 1000000
               + (coalesce(sum(n_tokens) OVER (PARTITION BY doc_id // 10000
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) // 2048)::bigint AS win
           FROM (SELECT doc_id, $tokSql AS n_tokens FROM documents))
         GROUP BY win ORDER BY win""",
    "x3_mixture_sample" ->
      s"""SELECT source, count(*) AS n_sampled, sum(n_tokens)::bigint AS n_tokens
         FROM (SELECT source, $tokSql AS n_tokens FROM documents
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
                 CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 'ff'
                      WHEN CAST(substr(source, 4) AS INT) < 10 THEN '7f'
                      ELSE '1f' END)
         GROUP BY source ORDER BY source""",
    "x5_profile" -> Seq("l_orderkey", "l_returnflag", "l_shipdate").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n,
         sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::bigint AS n_null,
         count(DISTINCT $c) AS n_distinct,
         CAST(min($c) AS VARCHAR) AS min_s,
         CAST(max($c) AS VARCHAR) AS max_s FROM lineitem""")
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "x4_cluster_split" ->
      s"""WITH RECURSIVE pairs AS (
           SELECT i, j FROM (${Dedup.exactJaccardSql(0.8)
             .replace("ORDER BY i, j", "")})),
         edges AS (SELECT i AS src, j AS dst FROM pairs
                   UNION ALL SELECT j, i FROM pairs),
         verts AS (SELECT DISTINCT src AS id FROM edges),
         reach(id, root) AS (
           SELECT id, id FROM verts
           UNION
           SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
         comp AS (SELECT id, min(root)::bigint AS lbl FROM reach GROUP BY id)
         SELECT d.doc_id,
           coalesce(c.lbl, d.doc_id) AS cluster,
           ${splitSql.format("coalesce(c.lbl, d.doc_id)",
             "coalesce(c.lbl, d.doc_id)")} AS split
         FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY d.doc_id""",
    // same 5-token distinct shingles as the dedup family; count() over
    // a left join counts matched eval shingles (0 when none)
    "x6_decontaminate" ->
      s"""WITH sh AS (${Dedup.shingleSql}),
         ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20),
         o AS (SELECT c.doc_id, count(ev.s)::bigint AS n_overlap
               FROM c LEFT JOIN ev ON c.s = ev.s GROUP BY c.doc_id)
       SELECT d.doc_id,
         coalesce(o.n_overlap, 0)::bigint AS n_overlap,
         coalesce(o.n_overlap, 0) > 0 AS contaminated
       FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
       LEFT JOIN o ON d.doc_id = o.doc_id ORDER BY d.doc_id""",
    "x7_epoch_shuffle" ->
      """SELECT doc_id,
         md5('epoch7:' || doc_id::varchar) AS shuffle_key,
         ('0x' || substr(md5('epoch7:' || doc_id::varchar), 1, 2))::bigint
           AS shard
       FROM documents ORDER BY shuffle_key""",
    // the dedup/quality/decontamination/split stages replayed with the
    // same formulas their standalone oracles use (t4 fingerprint, t2
    // quality, x6 shingle rule, x1 split thresholds)
    "x8_clean_corpus" -> {
      val stops = graft.functions.TextFunctions.StopWords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM (
             SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
             FROM documents) GROUP BY f),
         q AS (SELECT doc_id FROM (${TextOps.qualitySql})
           WHERE quality >= 0.5),
         sh AS (${Dedup.shingleSql}),
         ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20) c
             JOIN ev USING (s)),
         surv AS (SELECT d.doc_id,
             len(string_split_regex(trim(d.text), '\\s+'))::bigint AS n_tokens
           FROM documents d
           JOIN keep USING (doc_id) JOIN q USING (doc_id)
           WHERE d.doc_id >= 20
             AND d.doc_id NOT IN (SELECT doc_id FROM cont))
       SELECT ${splitSql.format("doc_id", "doc_id")} AS split,
         count(*) AS n_docs, sum(n_tokens)::bigint AS n_tokens
       FROM surv GROUP BY 1 ORDER BY 1"""
    },
    // weights are small integer-valued doubles (exact under any sum
    // order); rate/epochs derive from the ROUNDED integer target so
    // both engines divide the same numerator
    // x33: chunk slices replay chunkSql's list-slice rule; per-chunk
    // quality replays t2's formula over the chunk string
    "x33_chunk_filter" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks FROM documents),
         ch AS (SELECT doc_id, toks[c*64+1 : c*64+64] AS ctoks
           FROM tk, unnest(range(0, (len(toks)-1)//64 + 1)) AS u(c)),
         q0 AS (SELECT doc_id, len(ctoks) AS nt,
             len([t for t in ctoks if lower(t) IN
               ('the','a','an','and','of','to','in','is','on','for')])
               AS ns,
             length(array_to_string(ctoks, ' '))
               - length(regexp_replace(array_to_string(ctoks, ' '),
                   '[.,!?;:]', '', 'g')) AS np
           FROM ch),
         k AS (SELECT doc_id, nt,
             (round(0.4 * least(nt / 100.0, 1.0)
               + 0.3 * least(ns::double / greatest(nt::double, 1.0) * 4.0,
                   1.0)
               + 0.3 * (1.0 - least(np::double / greatest(nt::double, 1.0),
                   1.0)), 4) >= 0.5) AS keep
           FROM q0)
       SELECT doc_id, count(*) AS n_chunks,
         sum(CASE WHEN keep THEN 1 ELSE 0 END)::bigint AS n_kept,
         sum(CASE WHEN keep THEN nt ELSE 0 END)::bigint AS tokens_kept,
         CASE WHEN sum(CASE WHEN keep THEN 1 ELSE 0 END) = 0 THEN 'drop'
              WHEN sum(CASE WHEN keep THEN 1 ELSE 0 END) = count(*)
                THEN 'full'
              ELSE 'partial' END AS status
       FROM k GROUP BY doc_id ORDER BY doc_id""",
    // x32: rules replay t18/t2's exact fragments; the matrix unpivots
    // from one wide aggregation
    "x32_filter_ablation" -> {
      def cell(flag: String, v: String) = s"sum(CASE WHEN $flag THEN $v " +
        "ELSE 0 END)"
      val fails = Map(
        "len" -> "NOT p_len",
        "quality" -> "NOT p_quality",
        "stop" -> "NOT p_stop",
        "wordlen" -> "NOT p_wordlen")
      val onlys = Map(
        "len" -> "NOT p_len AND p_quality AND p_stop AND p_wordlen",
        "quality" -> "p_len AND NOT p_quality AND p_stop AND p_wordlen",
        "stop" -> "p_len AND p_quality AND NOT p_stop AND p_wordlen",
        "wordlen" -> "p_len AND p_quality AND p_stop AND NOT p_wordlen")
      val legs = Seq("len", "quality", "stop", "wordlen").map { r =>
        s"""SELECT '$r' AS rule,
           ${cell(fails(r), "1")}::bigint AS n_fail,
           ${cell(onlys(r), "1")}::bigint AS n_fail_only,
           ${cell(onlys(r), "nt")}::bigint AS tokens_only,
           (${cell(fails(r), "1")} * 10000 // count(*))::bigint AS fail_bp
         FROM f"""
      }.mkString("\n UNION ALL \n")
      s"""WITH q AS (${TextOps.qualitySql}),
         g AS (SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS toks,
             length(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g'))::double
               AS nc
           FROM documents),
         f AS (SELECT q.n_tokens AS nt,
             (len(toks) BETWEEN 50 AND 100000) AS p_len,
             (q.quality >= 0.5) AS p_quality,
             (len(list_intersect(list_distinct([lower(t) for t in toks]),
               [${graft.functions.TextFunctions.StopWords
                   .map(w => s"'$w'").mkString(", ")}])) >= 2)
               AS p_stop,
             (nc / len(toks) BETWEEN 3.8 AND 5.0) AS p_wordlen
           FROM g JOIN q ON g.doc_id = q.doc_id)
       SELECT * FROM ($legs) ORDER BY rule"""
    },
    // x30: the 8-token shingle set replays shingleSql's list
    // comprehension at width 8; split re-drawn from the fixture ids
    "x30_split_leakage" ->
      s"""WITH base AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 9100000, text FROM documents
           WHERE doc_id % 97 = 2),
         dd AS (SELECT doc_id,
             ${splitSql.format("doc_id", "doc_id")} AS split,
             string_split_regex(trim(text), '\\s+') AS toks FROM base),
         sh AS (SELECT doc_id, split, unnest(list_distinct(
             [array_to_string(list_slice(toks, i, i + 7), ' ')
              for i in range(1, len(toks) - 6)])) AS g FROM dd),
         tr AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
         ev AS (SELECT e.doc_id, e.split,
             max(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS leaked
           FROM (SELECT * FROM sh WHERE split <> 'train') e
           LEFT JOIN tr ON e.g = tr.g GROUP BY e.doc_id, e.split)
       SELECT d.split, count(*) AS n_docs,
         coalesce(sum(l.leaked), 0)::bigint AS n_leaked,
         (coalesce(sum(l.leaked), 0) * 10000 // count(*))::bigint AS leak_bp
       FROM (SELECT doc_id, split FROM dd WHERE split <> 'train') d
       LEFT JOIN ev l ON d.doc_id = l.doc_id AND d.split = l.split
       GROUP BY d.split ORDER BY d.split""",
    // x31: all-integer (//, least) — the ceiling branch fires for the
    // fixture tail source only, by construction
    "x31_epoch_plan" ->
      s"""WITH base AS (
           SELECT source, $tokSql AS nt FROM documents
           UNION ALL
           SELECT 'src_tail' AS source, $tokSql AS nt FROM documents
           WHERE doc_id IN (1, 98)),
         src AS (SELECT source, sum(nt)::bigint AS n_tokens
                 FROM base GROUP BY source),
         tot AS (SELECT sum(n_tokens)::bigint AS tt,
                        count(*)::bigint AS ns FROM src)
       SELECT source, n_tokens,
         least(tt // 2 // ns, n_tokens * 4)::bigint AS alloc_tokens,
         (least(tt // 2 // ns, n_tokens * 4) * 10000 // n_tokens)::bigint
           AS epochs_bp,
         (tt // 2 // ns - least(tt // 2 // ns, n_tokens * 4))::bigint
           AS deficit
       FROM src, tot ORDER BY source""",
    // x29: sqrt is correctly rounded in both engines (pow is not —
    // the τ=0.5 choice); the normalizer is list_sum over
    // source-ordered weights, replaying Spark's sorted left fold
    "x29_mixture_temperature" ->
      s"""WITH per AS (SELECT source, sum($tokSql)::bigint AS n_tokens
           FROM documents GROUP BY source),
         tot AS (SELECT sum(n_tokens)::bigint AS t FROM per),
         j AS (SELECT source, n_tokens,
             n_tokens::double / t::double AS p,
             sqrt(n_tokens::double / t::double) AS w
           FROM per, tot),
         ws AS (SELECT list_sum(list(w ORDER BY source)) AS s FROM j)
       SELECT source, n_tokens, p, w, w / ws.s AS share
       FROM j, ws ORDER BY source""",
    // x28: d1's keeper rule at token grain + x9's allocation over the
    // KEPT supply; integer-div bp, rate over the rounded target with
    // the same greatest(kept,1) guard
    "x28_dedup_replan" ->
      s"""WITH corpus AS (
           SELECT doc_id, source, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, source, text FROM documents
           WHERE doc_id % 97 = 1),
         dd AS (SELECT doc_id, source, $tokSql AS n,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
           FROM corpus),
         keep AS (SELECT fp, min(doc_id) AS keep_id FROM dd GROUP BY fp),
         per AS (SELECT source,
             sum(n)::bigint AS n_raw,
             sum(CASE WHEN doc_id = keep_id THEN n ELSE 0 END)::bigint
               AS n_kept,
             (CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 4.0
                   WHEN CAST(substr(source, 4) AS INT) < 10 THEN 2.0
                   ELSE 1.0 END)::double AS weight
           FROM dd JOIN keep USING (fp) GROUP BY source),
         tot AS (SELECT sum(weight) AS wsum FROM per)
       SELECT source, n_raw, n_kept,
         ((n_raw - n_kept) * 10000 // n_raw)::bigint AS loss_bp,
         round(100000.0 * weight / wsum, 0)::bigint AS target_tokens,
         round(least(1.0, round(100000.0 * weight / wsum, 0) /
           greatest(n_kept, 1)), 6) AS rate
       FROM per, tot ORDER BY source""",
    "x9_mixture_plan" ->
      s"""WITH per AS (SELECT source,
             sum($tokSql)::bigint AS n_tokens,
             (CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 4.0
                   WHEN CAST(substr(source, 4) AS INT) < 10 THEN 2.0
                   ELSE 1.0 END)::double AS weight
           FROM documents GROUP BY source),
         tot AS (SELECT sum(weight) AS wsum FROM per)
       SELECT source, n_tokens, weight,
         round(100000.0 * weight / wsum, 0)::bigint AS target_tokens,
         round(least(1.0,
           round(100000.0 * weight / wsum, 0) / n_tokens), 6) AS rate,
         round(greatest(1.0, least(3.0,
           round(100000.0 * weight / wsum, 0) / n_tokens)), 6) AS epochs
       FROM per, tot ORDER BY source""",
    // x10: the window replay of the bounded-heap rank — fixed-length
    // lowercase hex substring, so string order == the Spark side's
    // 52-bit integer order
    "x10_source_cap" ->
      """SELECT source, rk, doc_id FROM (
         SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
             ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13),
                      doc_id) AS rk
         FROM documents)
       WHERE rk <= 10 ORDER BY source, rk""",
    // x11: identical integer pipeline — positional 5-gram hits vs the
    // eval shingle set, ±2-token margin, gaps-and-islands merge, kept
    // segments; window sums cast ::bigint (DuckDB returns HUGEINT)
    "x11_decontam_clean" ->
      """WITH b AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks,
             len(string_split_regex(trim(text), '\s+'))::bigint AS n
           FROM documents),
         ev AS (SELECT DISTINCT
             unnest([array_to_string(list_slice(toks, i, i + 4), ' ')
                     for i in range(1, len(toks) - 3)]) AS s
           FROM b WHERE doc_id < 20 AND n >= 5),
         hs AS (SELECT doc_id,
             unnest([{'pos': i,
               's': array_to_string(list_slice(toks, i, i + 4), ' ')}
              for i in range(1, len(toks) - 3)]) AS u
           FROM b WHERE doc_id >= 20 AND n >= 5),
         iv AS (SELECT h.doc_id,
             greatest(1, (h.u).pos - 2)::bigint AS lo,
             least(b.n + 1, (h.u).pos + 7)::bigint AS hi
           FROM hs h JOIN b USING (doc_id)
           WHERE (h.u).s IN (SELECT s FROM ev)),
         i1 AS (SELECT doc_id, lo, hi,
             max(hi) OVER (PARTITION BY doc_id ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           FROM iv),
         i2 AS (SELECT doc_id, lo, hi,
             sum(CASE WHEN pmax IS NULL OR lo > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY lo, hi
                 ROWS UNBOUNDED PRECEDING)::bigint AS island
           FROM i1),
         merged AS (SELECT doc_id, island,
             min(lo) AS lo_m, max(hi) AS hi_m
           FROM i2 GROUP BY 1, 2),
         gaps AS (SELECT doc_id,
             coalesce(lag(hi_m) OVER (PARTITION BY doc_id ORDER BY lo_m),
               1)::bigint AS seg_lo,
             lo_m AS seg_hi
           FROM merged),
         tails AS (SELECT m.doc_id,
             max(m.hi_m)::bigint AS seg_lo,
             (any_value(b.n) + 1)::bigint AS seg_hi
           FROM merged m JOIN b USING (doc_id) GROUP BY m.doc_id),
         untouched AS (SELECT doc_id, 1::bigint AS seg_lo,
             (n + 1)::bigint AS seg_hi
           FROM b WHERE doc_id >= 20
             AND doc_id NOT IN (SELECT doc_id FROM merged)),
         segs AS (SELECT * FROM gaps UNION ALL SELECT * FROM tails
           UNION ALL SELECT * FROM untouched)
       SELECT s.doc_id,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY s.seg_lo)
           ::bigint AS seg_idx,
         s.seg_lo AS seg_start,
         (s.seg_hi - s.seg_lo)::bigint AS seg_tokens,
         array_to_string(list_slice(b.toks, s.seg_lo, s.seg_hi - 1), ' ')
           AS seg_text
       FROM segs s JOIN b USING (doc_id)
       WHERE s.seg_hi > s.seg_lo
       ORDER BY doc_id, seg_idx""",
    // x12: same integer windows — DuckDB list slices are 1-based
    // inclusive, so [gs*48+1 : gs*48+64] is Spark's slice(start, 64)
    "x12_chunking" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks FROM documents),
         n AS (SELECT doc_id, toks, len(toks)::bigint AS n,
             CASE WHEN len(toks) <= 64 THEN 1::bigint
                  ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT)
             END AS n_chunks
           FROM t)
       SELECT doc_id, gs AS chunk_id,
         array_to_string(toks[gs*48+1 : gs*48+64], ' ') AS chunk_text,
         least(64, n - gs*48)::bigint AS n_chunk_tokens
       FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(gs)
       ORDER BY doc_id, chunk_id""",
    // x13 publishes algorithm invariants per domain (the v3/v11
    // contract): sampling can only shrink a domain, and every domain
    // levels to the smallest domain's mass within wide tolerance.
    "x13_domain_mixture" ->
      """SELECT true AS multi_domain, true AS subset_ok,
         true AS balanced_ok""",
    // x16: the smoothed log-ratio model as a DuckDB map, folded per
    // doc in token order (the t8 oracle pattern)
    "x16_dsir_select" ->
      """WITH d AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks FROM documents),
         ctab AS (SELECT tok, count(*)::double AS cc
           FROM (SELECT unnest(toks) AS tok FROM d WHERE doc_id >= 20)
           GROUP BY tok),
         ttab AS (SELECT tok, count(*)::double AS tc
           FROM (SELECT unnest(toks) AS tok FROM d WHERE doc_id < 20)
           GROUP BY tok),
         v AS (SELECT tok, coalesce(cc, 0) AS cc, coalesce(tc, 0) AS tc
           FROM ctab FULL OUTER JOIN ttab USING (tok)),
         s AS (SELECT sum(cc) AS ct, sum(tc) AS tt,
             count(*)::double AS vn FROM v),
         m AS (SELECT map(list(tok),
             list(ln((tc + 0.5) / (tt + 0.5 * vn)) -
                  ln((cc + 0.5) / (ct + 0.5 * vn)))) AS lrm FROM v, s)
       SELECT doc_id,
         round(list_sum([map_extract(lrm, x)[1] for x in toks])
           / len(toks), 4) + 0.0 AS dsir,
         round(list_sum([map_extract(lrm, x)[1] for x in toks])
           / len(toks), 4) > 0 AS kept
       FROM d, m WHERE doc_id >= 20 ORDER BY doc_id""",
    // x15: 64-token chunk fingerprints (md5 of the space-joined
    // slice), corpus-wide fingerprint counts, per-doc dup fraction
    "x15_chunk_dedup" ->
      s"""WITH ch AS ($chunkSql),
         df AS (SELECT fp, count(*) AS n FROM ch GROUP BY fp)
       SELECT doc_id, count(*) AS n_chunks,
         sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::bigint AS n_dup,
         round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::double / count(*), 4)
           AS dup_frac
       FROM ch JOIN df USING (fp) GROUP BY doc_id ORDER BY doc_id""",
    // x26: x15's chunk CTE with source carried through, rolled to
    // source grain, integer bp
    "x26_source_dup_report" ->
      s"""WITH ch AS ($chunkSql),
         df AS (SELECT fp, count(*) AS n FROM ch GROUP BY fp)
       SELECT source, count(*) AS n_chunks,
         sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::bigint AS n_dup,
         (sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 10000 // count(*))
           ::bigint AS dup_bp
       FROM ch JOIN df USING (fp) GROUP BY source ORDER BY source""",
    // x27: the same 10-bin smoothed PSI fold, left-assoc in bin order
    // from integer counts (raw-double publish; ln replays per x16)
    "x27_psi_drift" -> {
      def binCols(prefix: String) = (0 until 10).map(i =>
        s"sum(CASE WHEN bin = $i THEN 1 ELSE 0 END)::bigint AS $prefix$i")
        .mkString(",\n           ")
      val terms = (0 until 10).map { i =>
        val p = s"((c$i::double + 0.5) / (n_s::double + 5.0))"
        val r = s"(((t$i - c$i)::double + 0.5) / ((n_tot - n_s)::double + 5.0))"
        s"($p - $r) * ln($p / $r)"
      }.mkString("\n           + ")
      s"""WITH q AS (SELECT d.source, qq.quality
           FROM (${TextOps.qualitySql}) qq JOIN documents d USING (doc_id)),
         b AS (SELECT source,
             least(floor(quality * 10.0), 9.0)::int AS bin FROM q),
         ps AS (SELECT source, count(*)::bigint AS n_s, ${binCols("c")}
           FROM b GROUP BY source),
         t AS (SELECT count(*)::bigint AS n_tot, ${binCols("t")} FROM b)
       SELECT source, n_docs, psi, (psi > 0.25) AS shifted FROM (
         SELECT source, n_s AS n_docs, ($terms) AS psi FROM ps, t)
       ORDER BY source"""
    },
    // x14: t2's quality formula (4dp-rounded), fixed band thresholds
    // on the rounded score, md5 intra-stage order key
    // x19: the four standalone rules rebuilt verbatim (d1 fingerprint
    // survivorship, t2 quality, x6 shingle rule, t18 keep), joined
    "x19_filter_funnel" -> {
      s"""WITH fpk AS (SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
           FROM documents),
         keepers AS (SELECT f, min(doc_id) AS keep_id FROM fpk GROUP BY f),
         q AS (SELECT doc_id, quality
           FROM (${TextOps.qualitySql})),
         sh AS (${Dedup.shingleSql}),
         ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20) c
             JOIN ev USING (s)),
         g AS (SELECT doc_id,
             (len(toks) BETWEEN 50 AND 100000
              AND n_chars2::double / len(toks) BETWEEN 3 AND 10
              AND len([t for t in toks
                  if regexp_matches(t, '[A-Za-z]')])::double / len(toks)
                >= 0.8
              AND n_hash::double / len(toks) <= 0.1
              AND len(list_intersect(
                  list_distinct([lower(t) for t in toks]),
                  ['the','be','to','of','and','that','have','with'])) >= 2)
               AS keep
           FROM (SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS toks,
               length(regexp_replace(text, '[ \t\n\r\f]', '', 'g'))
                 AS n_chars2,
               length(text) - length(replace(text, '#', '')) AS n_hash
             FROM documents)),
         flags AS (SELECT d.doc_id,
             (d.doc_id <> k.keep_id) AS dup_exact,
             (q.quality < 0.5) AS low_quality,
             (d.doc_id IN (SELECT doc_id FROM cont)) AS contaminated,
             NOT g.keep AS gopher_fail
           FROM fpk d JOIN keepers k ON d.f = k.f
           JOIN q ON q.doc_id = d.doc_id
           JOIN g ON g.doc_id = d.doc_id
           WHERE d.doc_id >= 20)
       SELECT doc_id, dup_exact, low_quality, contaminated, gopher_fail,
         (CASE WHEN dup_exact THEN 1 ELSE 0 END
          + CASE WHEN low_quality THEN 1 ELSE 0 END
          + CASE WHEN contaminated THEN 1 ELSE 0 END
          + CASE WHEN gopher_fail THEN 1 ELSE 0 END)::bigint AS n_flags,
         (NOT dup_exact AND NOT low_quality AND NOT contaminated
          AND NOT gopher_fail) AS kept
       FROM flags ORDER BY doc_id"""
    },

    // x18: same per-doc features (d1's fingerprint, t1's tokens, t2's
    // 4dp quality), same dup rule, per-source rollup; avg of
    // 4dp-grid qualities rounds at 4dp (the a-family precedent)
    "x18_dataset_card" -> {
      s"""WITH qs AS (${TextOps.qualitySql}),
         f AS (SELECT d.doc_id, d.source, d.lang,
             md5(lower(regexp_replace(trim(d.text), '\\s+', ' ', 'g'))) AS fp,
             qs.n_tokens,
             CAST(round(qs.quality * 10000) AS BIGINT) AS qi
           FROM documents d JOIN qs USING (doc_id)),
         c AS (SELECT fp, count(*) AS nfp FROM f GROUP BY fp)
       SELECT source, count(*) AS n_docs,
         sum(n_tokens)::bigint AS n_tokens,
         round(sum(qi)::double / (count(*) * 10000), 4) AS avg_quality,
         count(DISTINCT lang) AS n_langs,
         sum(CASE WHEN nfp > 1 THEN 1 ELSE 0 END)::bigint AS n_dup_docs
       FROM f JOIN c USING (fp) GROUP BY source ORDER BY source"""
    },

    // x17: the selection rule replayed as the corpus-wide window
    // cumsum in (quality desc, doc_id) order — budget = 30% of total
    // tokens with matching integer floor division; kept is a pure
    // integer comparison, so threshold-selection ≡ cumsum exactly
    "x17_token_budget" -> {
      s"""WITH q AS (${TextOps.qualitySql}),
         b AS (SELECT (sum(n_tokens) * 3) // 10 AS bud FROM q),
         w AS (SELECT doc_id, quality, n_tokens,
             sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum FROM q)
       SELECT doc_id, quality, n_tokens, cum <= b.bud AS kept
       FROM w, b ORDER BY doc_id"""
    },

    "x14_curriculum" -> {
      s"""WITH q AS (SELECT doc_id, quality
           FROM (${TextOps.qualitySql}))
       SELECT doc_id, quality,
         (CASE WHEN quality >= 0.7 THEN 0 WHEN quality >= 0.6 THEN 1
               WHEN quality >= 0.5 THEN 2 ELSE 3 END)::bigint AS stage,
         md5('cur:' || doc_id::varchar) AS ord
       FROM q ORDER BY stage, ord"""
    },

    "x25_pack_efficiency" ->
      s"""WITH st AS (SELECT doc_id // 10000 AS shard,
             sum($tokSql)::bigint AS tok
           FROM documents GROUP BY 1),
         ws AS (SELECT unnest([512, 1024, 2048, 4096])::bigint AS w)
       SELECT w, sum((tok + w - 1) // w)::bigint AS n_windows,
         sum((tok + w - 1) // w * w - tok)::bigint AS pad_tokens,
         (sum((tok + w - 1) // w * w - tok) * 10000 //
           sum((tok + w - 1) // w * w))::bigint AS pad_bp
       FROM st, ws GROUP BY w ORDER BY w""",

    "x24_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp1
           FROM documents WHERE doc_id % 7 <> 0),
         v2 AS (SELECT doc_id,
             md5(lower(regexp_replace(trim(
               CASE WHEN doc_id % 11 = 0 THEN text || ' rev2'
                    ELSE text END), '\s+', ' ', 'g'))) AS fp2
           FROM documents WHERE doc_id % 13 <> 0)
       SELECT doc_id, change FROM (
         SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN fp1 <> fp2 THEN 'changed' END AS change
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
       WHERE change IS NOT NULL ORDER BY doc_id""",

    "x23_ngram_novelty" ->
      s"""WITH sh AS (${Dedup.shingleSql}),
         base AS (SELECT DISTINCT unnest(sh) AS s FROM sh
                  WHERE doc_id % 2 = 0),
         c AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh
               WHERE doc_id % 2 = 1)
       SELECT c.doc_id, count(*)::bigint AS n_shingles,
         sum(CASE WHEN base.s IS NULL THEN 1 ELSE 0 END)::bigint AS n_novel,
         (sum(CASE WHEN base.s IS NULL THEN 1 ELSE 0 END) * 10000
           // count(*))::bigint AS novelty_bp
       FROM c LEFT JOIN base ON c.s = base.s
       GROUP BY c.doc_id ORDER BY doc_id""",

    "x22_contamination_report" ->
      s"""WITH sh AS (${Dedup.shingleSql}),
         ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20),
         o AS (SELECT c.doc_id, count(ev.s) AS n_overlap
               FROM c LEFT JOIN ev ON c.s = ev.s GROUP BY c.doc_id),
         f AS (SELECT d.doc_id, ${splitSql.format("d.doc_id", "d.doc_id")}
                 AS split, coalesce(o.n_overlap, 0) > 0 AS contam
               FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
               LEFT JOIN o ON d.doc_id = o.doc_id)
       SELECT split, count(*) AS n_docs,
         sum(CASE WHEN contam THEN 1 ELSE 0 END)::bigint AS n_contaminated,
         (sum(CASE WHEN contam THEN 1 ELSE 0 END) * 10000 // count(*))
           ::bigint AS contam_bp
       FROM f GROUP BY split ORDER BY split""",

    // x21: per-doc replay (no level trick needed at oracle scale) —
    // integer comparisons on the shared 4dp quality basis points
    "x21_threshold_sweep" ->
      s"""WITH q AS (SELECT doc_id,
             CAST(round(quality * 10000) AS BIGINT) AS qi, n_tokens
           FROM (${TextOps.qualitySql})),
         tot AS (SELECT count(*) AS td FROM q),
         t AS (SELECT unnest(range(3000, 7500, 500)) AS tau_bp)
       SELECT tau_bp,
         sum(CASE WHEN qi >= tau_bp THEN 1 ELSE 0 END)::bigint AS n_docs,
         sum(CASE WHEN qi >= tau_bp THEN n_tokens ELSE 0 END)::bigint
           AS n_tokens,
         (sum(CASE WHEN qi >= tau_bp THEN 1 ELSE 0 END) * 10000 // td)
           ::bigint AS frac_bp
       FROM t, q, tot GROUP BY tau_bp, td ORDER BY tau_bp""",

    // x20: the window replay of the bounded-heap ES selection — same
    // exact u (52-bit md5 prefix + 0.5 over 2^52), same ln(u)/w key,
    // rank by (key desc, doc_id)
    "x20_priority_sample" ->
      """WITH k AS (SELECT source, doc_id, n_chars,
           ln((('0x' || substr(md5('pri:' || doc_id::VARCHAR), 1, 13))::BIGINT
               + 0.5) / 4503599627370496.0)
             / greatest(n_chars, 1) AS pri_key
         FROM documents)
       SELECT source, rk, doc_id, n_chars,
         round(pri_key, 10) + 0.0 AS pri_key FROM (
         SELECT source, doc_id, n_chars, pri_key,
           row_number() OVER (PARTITION BY source
             ORDER BY pri_key DESC, doc_id) AS rk
         FROM k)
       WHERE rk <= 10 ORDER BY source, rk"""
  )
}
