package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.core.{ArrayKind, ArraySchema, AttributeSpec, DimensionSpec}
import graft.sources.GraftArray
import graft.streaming.EventPipeline

/** Event-stream operators. st1 runs a REAL micro-batch Structured
  * Streaming query (memory sink, processAllAvailable) whose complete
  * output must equal the oracle's batch SQL — proving the streaming
  * surface computes the same answer as the relational one. st2 is
  * gap-based sessionization (30-min inactivity) as a declarative
  * window plan.
  */
object StreamOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windowed aggregation via readStream → memory sink.
    "st1_stream_windowed" -> ((s, d) =>
      EventPipeline.runStreamingWindowed(s, d)
        .orderBy("win_start_us", "event_type")),

    // Streaming SOURCE over an array: tail the fragment timeline with
    // a real readStream (memory sink, processAllAvailable). Two
    // fragments incl. an upsert — the stream delivers BOTH versions
    // (CDC semantics), the oracle states the expected event log.
    "st3_stream_tail" -> ((s, d) => {
      val uri = graft.core.TempDirs.fresh("graft_st3") + "/arr"
      val sch = ArraySchema(ArrayKind.Sparse,
        Seq(DimensionSpec("n_nationkey", IntegerType)),
        Seq(AttributeSpec("n_name", StringType),
          AttributeSpec("n_regionkey", IntegerType)))
      GraftArray.create(s, uri, sch)
      val nation = Tables.load(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      GraftArray.write(s, uri, nation)
      // upsert: region flipped to -1 for the first 5 nations
      GraftArray.write(s, uri, nation.filter(col("n_nationkey") < 5)
        .withColumn("n_regionkey", lit(-1)))
      val name = "graft_st3_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.format("graftarray").option("path", uri).load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy("n_nationkey", "n_regionkey")
    }),

    // Streaming stateful dedup — WATERMARK-BOUNDED state
    // (dropDuplicatesWithinWatermark, append mode): keys leave the
    // state store once the watermark passes their event time + delay,
    // so an unbounded stream holds bounded state. On this input (one
    // file → one micro-batch, watermark still at epoch during it) the
    // result equals exact COUNT(DISTINCT), which the oracle states;
    // the unbounded-state exact variant (dropDuplicates + complete
    // mode) remains as EventPipeline.runStreamingDedup, spec-checked
    // to agree (StreamingDedupSpec).
    "st4_stream_dedup" -> ((s, d) =>
      EventPipeline.runStreamingDedupBounded(s, d)
        .select(col("event_type"), col("count").as("n_users"))
        .orderBy("event_type")),

    // Stream-stream interval join: watermarked event-time join whose
    // buffered state is bounded by watermark eviction — the streaming
    // twin of the batch range join (j10).
    "st5_stream_join" -> ((s, d) =>
      EventPipeline.runStreamingIntervalJoin(s, d)
        .orderBy("event_id", "pus")),

    // Stream-stream LEFT OUTER interval join: unmatched clicks emit
    // their null row when the watermark proves no purchase can still
    // arrive — the eviction-triggered outer emit that makes this the
    // one join whose OUTPUT needs the drain sentinels, not just its
    // state bound. pus = -1 encodes "no purchase in the window" so the
    // sort keys stay null-free in both engines.
    "st16_stream_outer_join" -> ((s, d) =>
      EventPipeline.runStreamingOuterJoin(s, d)
        .orderBy("event_id", "pus")),

    // Stream-static enrichment join: batch-computed user tiers joined
    // into the click stream (STATELESS — no state store; the static
    // side broadcasts per micro-batch), then watermarked windowed
    // aggregation per tier. The canonical streaming dimension-join.
    "st6_stream_enrich" -> ((s, d) =>
      EventPipeline.runStreamEnrich(s, d)
        .orderBy("win_start_us", "tier")),

    // Sliding-window streaming aggregation (2 h window / 1 h slide —
    // each event in exactly 2 overlapping windows): the window()
    // expansion is a constant 2× multiplier on the partial-aggregate
    // exchange, never a join. Oracle replays the expansion as a
    // 2-element unnest.
    "st7_stream_sliding" -> ((s, d) =>
      EventPipeline.runStreamingSliding(s, d)
        .orderBy("win_start_us", "event_type")),

    // Checkpoint restart recovery: batch 0 → query stops → batch 1
    // under the SAME checkpoint; final counts equal the batch answer
    // only because offsets AND aggregation state recovered. Sink =
    // update-mode upserts into the array (latest-wins read IS the
    // aggregate).
    "st18_stream_restart" -> ((s, d) =>
      EventPipeline.runStreamRestartRecovery(s, d)
        .orderBy("win_start_us", "event_type")),

    // Streaming ingest + compaction MAINTENANCE loop (arr35 run the
    // way production runs it): two ingest waves, a compact_small pass
    // after each; the second pass folds only the new batches — the
    // wave-A merge is above the threshold and never rewritten again.
    "st17_stream_compact_loop" -> ((s, d) =>
      EventPipeline.runStreamCompactLoop(s, d)
        .orderBy("event_type")),

    // Stream → fragment-sink → array-read loop, oracle-verified: the
    // corpus streamed one staged file per micro-batch through a
    // stateless filter into the replay-ledgered array sink (one
    // immutable fragment per NON-EMPTY batch — the oracle derives the
    // expected count from the staging rule), then the ARRAY scan
    // answers the aggregation.
    "st9_stream_sink" -> ((s, d) =>
      EventPipeline.runStreamSinkPipeline(s, d)
        .orderBy("event_type")),

    // APPEND-mode tumbling windows (emit-once; st1's aggregation in
    // the production output mode) — drains via the shared
    // drainSessions sentinels, hour-aligned so the sentinel window
    // self-excludes. Same oracle math as st1: append mode changes
    // WHEN rows emit, never their values.
    "st10_stream_append_windows" -> ((s, d) =>
      EventPipeline.runStreamingAppendWindows(s, d)
        .orderBy("win_start_us", "event_type")),

    // Per-window distinct users: the MULTI-STATEFUL append chain
    // (windowed (win, user) pre-agg → windowed user count, one
    // watermark, both operators' state watermark-evicted) + the HLL
    // sketch twin whose bounded-error agreement is published per
    // window. Oracle = the batch COUNT(DISTINCT) replay.
    "st11_stream_distinct" -> ((s, d) =>
      EventPipeline.runStreamingDistinctUsers(s, d)),

    // Windowed trending: per-hour top-3 event types by count — the
    // streaming stage is st1's (window × type) state; the top-3 is the
    // dashboard read over the complete-mode sink (≤ types rows per
    // window, bounded window function).
    "st13_stream_trending" -> ((s, d) =>
      EventPipeline.runStreamingTrending(s, d)),

    // Bloom admission at ingest (d11 online): ZERO keyed streaming
    // state — the membership structure is a static O(bits) filter,
    // bloom-negatives skip the verify join entirely, and the
    // batch-exact oracle catches any false negative the filter could
    // theoretically produce (it can't — asserted in DedupSpec).
    "st12_stream_bloom_admission" -> ((s, d) =>
      EventPipeline.runStreamingBloomAdmission(s, d)),

    // Watermark-lateness audit: the engine's numRowsDroppedByWatermark
    // beside the surviving windows — metric, drop rule and final data
    // must agree with the SQL replay (a miscount OR a wrong drop
    // hash-mismatches).
    "st15_stream_lateness_audit" -> ((s, d) =>
      EventPipeline.runStreamingLatenessAudit(s, d)),

    // Decontamination at ingest (x6 online): static broadcast eval
    // shingle set, per-doc arrays_overlap admission — ZERO keyed
    // streaming state (the st12 admission family). Contaminated docs
    // are reported, not dropped.
    "st14_stream_decontam" -> ((s, d) =>
      EventPipeline.runStreamingDecontam(s, d)),

    // NATIVE streaming session windows (session_window + watermark,
    // append mode, watermark-flush sentinel): state = open sessions
    // only, evicted as the watermark passes each session's end. The
    // batch oracle replays the merge rule exactly — a session breaks
    // when the inter-event gap is >= the 8 h window gap (session
    // windows are [t, t+gap); an event AT the end does not merge —
    // note the >= where the lag-based st2 uses >).
    "st8_stream_session_window" -> ((s, d) =>
      EventPipeline.runStreamingSessionWindow(s, d)
        .orderBy("user_id", "start_us")),

    // Sessionization: session breaks at >30 min inactivity per user.
    "st2_sessions" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gapUs = 30L * 60 * 1000000 // 30 min in µs
      val withSess = ev
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1L)
            .otherwise(lit(0L)))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withSess.groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .orderBy("user_id", "sess_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // st12: the exact membership answer — ONE definition shared with
    // d11 (a Bloom false negative would hash-mismatch here)
    "st12_stream_bloom_admission" -> Dedup.bloomMembershipSql,
    // st15: the late-drop rule replayed — the filter watermark is the
    // ADVANCER's ts (corpus max + 60 s) − 10 min; a late row drops iff
    // its hour-window end ≤ that; survivors aggregate, the advancer's
    // own window emits, and the drop count rides every row.
    // numRowsDroppedByWatermark meters the STATEFUL operator, which
    // sits above the map-side partial aggregation — it counts dropped
    // PARTIAL rows, and the late slice stages as ONE file/partition,
    // so that is exactly the DISTINCT (window, type) count among
    // dropped rows (1 637 of 1 998 raw rows at sf0.01).
    "st15_stream_lateness_audit" ->
      """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
         wm AS (SELECT m + 60000000 - 600000000 AS w, m FROM mx),
         late AS (SELECT ts, event_type, value,
             (epoch_us(ts) // 3600000000) * 3600000000 AS win,
             ((epoch_us(ts) // 3600000000) + 1) * 3600000000 AS wend
           FROM events WHERE event_id % 5 = 0),
         surv AS (
           SELECT ts, event_type, value FROM events WHERE event_id % 5 <> 0
           UNION ALL
           SELECT ts, event_type, value FROM late, wm WHERE wend > wm.w),
         d AS (SELECT count(DISTINCT (win, event_type))::bigint AS nd
               FROM late, wm WHERE wend <= wm.w),
         agg AS (
           SELECT (epoch_us(ts) // 3600000000) * 3600000000
               AS win_start_us,
             event_type, count(*) AS n, round(sum(value), 2) AS total
           FROM surv GROUP BY 1, 2
           UNION ALL
           SELECT ((m + 60000000) // 3600000000) * 3600000000,
             'advancer', 1::bigint, 0.0::double FROM mx)
       SELECT win_start_us, event_type, n, total, d.nd AS n_late_dropped
       FROM agg, d ORDER BY win_start_us, event_type""",
    // st14: x6's shingle-overlap rule at boolean grain — a doc is
    // admitted iff none of its 5-token shingles appear in the eval
    // set (short docs shingle to [] and admit trivially)
    "st14_stream_decontam" ->
      s"""WITH sh AS (${Dedup.shingleSql}),
         ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20),
         o AS (SELECT DISTINCT c.doc_id FROM c JOIN ev ON c.s = ev.s)
       SELECT d.doc_id, (o.doc_id IS NULL) AS admitted
       FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
       LEFT JOIN o ON o.doc_id = d.doc_id
       ORDER BY d.doc_id""",
    "st1_stream_windowed" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    // st18: the restart-recovered two-phase run must equal st1's
    // single-pass batch math exactly
    "st18_stream_restart" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    // st13: st1's hourly counts, top-3 per window, (n desc, type) ties
    "st13_stream_trending" ->
      """SELECT win_start_us, event_type, n, rk FROM (
           SELECT win_start_us, event_type, n,
             row_number() OVER (PARTITION BY win_start_us
               ORDER BY n DESC, event_type)::bigint AS rk
           FROM (SELECT (epoch_us(ts) // 3600000000) * 3600000000
                   AS win_start_us,
                 event_type, count(*) AS n
               FROM events GROUP BY 1, 2))
         WHERE rk <= 3 ORDER BY win_start_us, rk""",
    // st10: append mode changes when windows emit, not their values —
    // the batch hourly aggregation is the oracle, identical to st1's
    "st10_stream_append_windows" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    // st9: the array round-trip preserves the filtered events exactly,
    // so the batch aggregation is the oracle. n_fragments is DERIVED
    // from the staging rule, not a literal: the sink commits a
    // fragment only for a NON-EMPTY micro-batch, so the expected count
    // is the number of event_id%3 slices with at least one non-view
    // row — a literal 3 would silently couple the oracle to the
    // current corpus's event-type distribution.
    "st9_stream_sink" ->
      """WITH fr AS (SELECT count(DISTINCT event_id % 3) AS nf
           FROM events WHERE event_type <> 'view')
       SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
         fr.nf AS n_fragments
         FROM events, fr WHERE event_type <> 'view'
         GROUP BY event_type, fr.nf ORDER BY event_type""",
    // st8: session_window merge rule — break at gap >= 8h (strictly:
    // [t, t+gap) windows merge only when the next start is INSIDE);
    // end_us = last event + gap
    "st8_stream_session_window" ->
      """WITH raw AS (
           SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
         e AS (
           SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) >= 28800000000 THEN 1 ELSE 0 END
             AS new_sess
           FROM raw),
         s AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM e)
       SELECT user_id, min(us) AS start_us,
         max(us) + 28800000000 AS end_us,
         count(*) AS n, round(sum(value), 2) AS total
       FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""",
    // st7: 2h/1h sliding windows — an event at t belongs to the
    // windows starting at floor_h(t) and floor_h(t) − 1h
    "st7_stream_sliding" ->
      """SELECT win_start_us, event_type, count(*) AS n,
         round(sum(value), 2) AS total
         FROM (SELECT unnest([
             (epoch_us(ts) // 3600000000) * 3600000000,
             (epoch_us(ts) // 3600000000) * 3600000000 - 3600000000])
             AS win_start_us,
           event_type, value FROM events)
         GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    "st3_stream_tail" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
         UNION ALL
         SELECT n_nationkey, n_name, -1 AS n_regionkey FROM nation
         WHERE n_nationkey < 5
         ORDER BY n_nationkey, n_regionkey""",
    "st4_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    // st11: append mode changes when windows emit, never their
    // values — the batch distinct replay is the oracle; approx_ok is
    // the published HLL-agreement invariant (true at any corpus whose
    // per-window cardinality keeps HLL± inside 15%)
    "st11_stream_distinct" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         count(DISTINCT user_id) AS n_users, true AS approx_ok
         FROM events GROUP BY 1 ORDER BY win_start_us""",
    "st5_stream_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS pus
               FROM events WHERE event_type = 'purchase')
       SELECT c.event_id, c.user_id, c.us, p.pus
       FROM c JOIN p ON c.user_id = p.user_id
         AND c.us BETWEEN p.pus - 1800000000 AND p.pus
       ORDER BY c.event_id, p.pus""",
    // st17: data parity over the %8<=5 slice; the policy outcome
    // (fragments, compaction runs) replays from the slice counts and
    // the 3/8 threshold — never a hardcoded count
    "st17_stream_compact_loop" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events
           WHERE event_id % 8 <= 5),
         thr AS (SELECT (SELECT count(*) FROM events) * 3 // 8 AS t),
         sl AS (SELECT event_id % 8 AS s, count(*) AS c FROM e GROUP BY 1),
         w AS (SELECT
             sum(CASE WHEN s <= 3 AND c <= t THEN 1 ELSE 0 END) AS small_a,
             sum(CASE WHEN s <= 3 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN s <= 3 THEN c ELSE 0 END) AS ca,
             sum(CASE WHEN s >= 4 AND c <= t THEN 1 ELSE 0 END) AS small_b,
             sum(CASE WHEN s >= 4 THEN 1 ELSE 0 END) AS n_b,
             any_value(t) AS t
           FROM sl, thr),
         -- pass-2 cases (wave slices are near-equal eighths, so each
         -- wave is small-homogeneous; mixed-size waves can't occur on
         -- a mod-sliced corpus): if the wave-A merge is itself still
         -- small (ca <= t), the second run absorbs it TOO (nf = 1);
         -- above the threshold it survives beside the wave-B merge
         pol AS (SELECT
             (CASE
                WHEN small_a >= 2 AND small_b >= 2 AND ca <= t THEN 1
                WHEN small_a >= 2 AND small_b >= 2 THEN 2
                WHEN small_a >= 2 THEN 1 + n_b
                ELSE n_a + n_b END)::bigint AS nf,
             ((CASE WHEN small_a >= 2 THEN 1 ELSE 0 END)
              + (CASE WHEN small_b >= 2 THEN 1 ELSE 0 END))
               ::bigint AS runs
           FROM w)
       SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
         pol.nf AS n_fragments, pol.runs AS n_compactions
       FROM e, pol GROUP BY event_type, pol.nf, pol.runs
       ORDER BY event_type""",
    "st16_stream_outer_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS pus
               FROM events WHERE event_type = 'purchase')
       SELECT c.event_id, c.user_id, c.us,
         coalesce(p.pus, -1) AS pus
       FROM c LEFT JOIN p ON c.user_id = p.user_id
         AND p.pus BETWEEN c.us AND c.us + 1800000000
       ORDER BY c.event_id, pus""",
    "st6_stream_enrich" ->
      """WITH t AS (SELECT user_id,
           CASE WHEN round(sum(value), 2) >= 500 THEN 'high'
                ELSE 'low' END AS tier
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT (epoch_us(e.ts) // 3600000000) * 3600000000 AS win_start_us,
         coalesce(t.tier, 'none') AS tier, count(*) AS n,
         round(sum(e.value), 2) AS total
       FROM events e LEFT JOIN t USING (user_id)
       WHERE e.event_type = 'click'
       GROUP BY 1, 2 ORDER BY win_start_us, tier""",
    "st2_sessions" ->
      """WITH raw AS (
           SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
         e AS (
           SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM raw),
         s AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id
             ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)::bigint AS sess_id
           FROM e)
       SELECT user_id, sess_id, count(*) AS n, round(sum(value), 2) AS total,
         min(us) AS start_us, max(us) AS end_us
       FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id"""
  )
}
