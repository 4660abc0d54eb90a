package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series join operators Spark lacks natively — as-of join and
  * range (interval) join — composed from existing operators so
  * Catalyst/Tungsten run them (no custom physical nodes needed):
  *
  *  - [[asofJoin]]: union + partitioned last-known-value window. ONE
  *    shuffle on the join keys, no row inflation, no range cross
  *    product — the scale shape for "latest quote before each trade"
  *    joins at any corpus size (cost = shuffle of |L|+|R| rows).
  *  - [[rangeJoinBinned]]: interval containment as an equi-join on
  *    bin numbers. Intervals explode to the bins they span (bounded
  *    by interval_width/binWidth per row), points map to one bin, and
  *    Spark plans a plain shuffled/broadcast hash join on
  *    (keys, bin) — no O(|L|·|R|) nested loop. binWidth tunes the
  *    replication-vs-selectivity trade.
  *
  * (Additive surface: the reference has no temporal joins; these are
  * the standard building blocks a training-data pipeline needs for
  * event attribution and windowed joins.)
  */
object Temporal {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Backward as-of join: for each left row, attach the right row with
    * the same `keys` and the greatest `rightTs` ≤ `leftTs` (LEFT-join
    * semantics — unmatched left rows keep nulls). Carried right
    * columns come back as `asof_<col>` (the matched `rightTs` as
    * `asof_<rightTs>`).
    *
    * Contract: ts columns are NUMERIC (e.g. unix micros);
    * `right` has at most one row per (keys, rightTs) — pre-aggregate
    * otherwise (ties across engines are not deterministic);
    * `toleranceMicros` nulls matches older than `leftTs - tolerance`.
    *
    * Shape: tag both sides, union, one window over (keys) ordered by
    * (ts, side) with rights sorting before lefts at equal ts (≤
    * semantics), `last(struct, ignoreNulls)` carries the most recent
    * right ROW forward as one struct — never per-column, so a NULL in
    * a carried right column stays the matched row's NULL instead of
    * resurrecting an older row's value — then keep only left rows. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val carry = (rightCols :+ rightTs).distinct
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lu = left.withColumn("_graft_ats", col(leftTs))
      .withColumn("_graft_side", lit(1))
      .withColumn("_graft_asof", lit(null).cast(carryType))
    val ru0 = right.withColumn("_graft_ats", col(rightTs))
      .withColumn("_graft_side", lit(0))
      .withColumn("_graft_asof", struct(carry.map(col): _*))
    // align the right frame to the union schema: left-only columns
    // ride as nulls (they are never read on side-0 rows)
    val ru = ru0.select(lu.columns.map { c =>
      if (ru0.columns.contains(c)) col(c)
      else lit(null).cast(lu.schema(c).dataType).as(c)
    }: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ats").asc, col("_graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the struct is null exactly on left rows, so ignoreNulls skips to
    // the most recent RIGHT row — whole-row atomically
    val filled = lu.unionByName(ru)
      .withColumn("_graft_asof",
        last(col("_graft_asof"), ignoreNulls = true).over(w))
    val lefts = filled.filter(col("_graft_side") === 1)
    val ok = toleranceMicros.fold(lit(true)) { tol =>
      col(s"_graft_asof.$rightTs").isNotNull &&
        col("_graft_ats") - col(s"_graft_asof.$rightTs") <= tol
    }
    carry.foldLeft(lefts)((df, c) =>
        df.withColumn(s"asof_$c", when(ok, col(s"_graft_asof.$c"))))
      .drop("_graft_ats", "_graft_side", "_graft_asof")
  }

  /** FORWARD as-of join: for each left row, the right row with the
    * smallest `rightTs` ≥ `leftTs` (next-known-value — "the NEXT
    * purchase after each click", the attribution mirror of backward
    * as-of). Implemented by running [[asofJoin]] over NEGATED
    * timestamps — the greatest −rightTs ≤ −leftTs IS the smallest
    * rightTs ≥ leftTs, the tie rule (rights before lefts at equal ts)
    * maps to ≥ semantics, and the tolerance check replays as
    * rightTs − leftTs ≤ tol — so the one-shuffle window shape (and
    * every contract) is inherited rather than re-derived. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val ln = left.withColumn("_graft_fneg", -col(leftTs))
    val rn = right.withColumn("_graft_frneg", -col(rightTs))
    asofJoin(ln, rn, keys, "_graft_fneg", "_graft_frneg",
      rightCols, toleranceMicros)
      .withColumn(s"asof_$rightTs", -col("asof__graft_frneg"))
      .drop("_graft_fneg", "asof__graft_frneg")
  }

  /** Range (interval-containment) join: left rows whose `leftPoint`
    * falls in a right row's [`rightLo`, `rightHi`] (inclusive), with
    * optional equi-`keys`. All three columns are LONGS (e.g. unix
    * micros). Each interval is exploded to the `binWidth`-sized bins
    * it spans; a point lives in exactly one bin, so every qualifying
    * (point, interval) pair meets in exactly one equi-join match — no
    * duplicate results, no cross product. Pick binWidth near the
    * typical interval width: replication ≈ width/binWidth + 1. */
  /** Exact floor division on longs (pmod is always non-negative) —
    * the ONE bin-number definition shared by both binned joins. */
  private def floorDivBy(c: Column, binWidth: Long): Column =
    ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")

  def rangeJoinBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftPoint: String, rightLo: String, rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def floorDiv(c: Column): Column = floorDivBy(c, binWidth)
    val l2 = left.withColumn("_graft_bin", floorDiv(col(leftPoint)))
    val r2 = right.withColumn("_graft_bin",
      explode(sequence(floorDiv(col(rightLo)), floorDiv(col(rightHi)))))
    l2.join(r2, keys :+ "_graft_bin")
      .filter(col(leftPoint).between(col(rightLo), col(rightHi)))
      .drop("_graft_bin")
  }

  /** Interval-OVERLAP join: pairs where [lLo,lHi] and [rLo,rHi]
    * intersect (inclusive; optional equi-`keys`). BOTH sides explode
    * to their bins; a qualifying pair would meet once per SHARED bin,
    * so the match is kept only in the FIRST shared bin —
    * `max(floorDiv(lLo), floorDiv(rLo))`, which overlap guarantees
    * lies inside both exploded ranges — making each pair emit exactly
    * once with no distinct pass. Replication stays width/binWidth + 1
    * per row, and Spark plans a plain hash join on (keys, bin). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], lLo: String, lHi: String,
      rLo: String, rHi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def floorDiv(c: Column): Column = floorDivBy(c, binWidth)
    val l2 = left.withColumn("_graft_bin",
      explode(sequence(floorDiv(col(lLo)), floorDiv(col(lHi)))))
    val r2 = right.withColumn("_graft_bin",
      explode(sequence(floorDiv(col(rLo)), floorDiv(col(rHi)))))
    l2.join(r2, keys :+ "_graft_bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("_graft_bin") ===
        greatest(floorDiv(col(lLo)), floorDiv(col(rLo))))
      .drop("_graft_bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each click event attaches the user's most recent
    // purchase at-or-before it (purchases pre-aggregated per (user,
    // ts) so the match is unique — max is order-independent, exact
    // across engines). DuckDB replays with a native ASOF LEFT JOIN.
    "j9_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(round(max(col("value")), 2).as("rval"))
      asofJoin(clicks, purchases, Seq("user_id"), "us", "rus", Seq("rval"))
        .select(col("event_id"), col("user_id"), col("us"),
          col("asof_rus").as("prev_us"), col("asof_rval").as("prev_val"))
        .orderBy("event_id")
    }),

    // FORWARD as-of: each click attaches the user's NEXT purchase
    // at-or-after it (conversion attribution); same pre-aggregated
    // unique right side as j9, same one-shuffle window shape via the
    // negated-ts wrapper.
    "j13_asof_forward" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(round(max(col("value")), 2).as("rval"))
      asofJoinForward(clicks, purchases, Seq("user_id"), "us", "rus",
          Seq("rval"))
        .select(col("event_id"), col("user_id"), col("us"),
          col("asof_rus").as("next_us"), col("asof_rval").as("next_val"))
        .orderBy("event_id")
    }),

    // NEAREST-event join — the bidirectional completion of the as-of
    // family: each click attaches the same user's purchase with the
    // smallest |Δt| in EITHER direction (sensor alignment / nearest-
    // observation imputation — backward-only as-of systematically
    // biases toward stale values). Composes the two existing one-
    // shuffle legs (j9 backward, j13 forward) and resolves per click
    // with pure integer arithmetic; ties (equidistant before/after)
    // take the BACKWARD value — deterministic and causal (prefer what
    // was already known). Unmatched side encodes as -1 like st16.
    "j16_nearest_event" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(round(max(col("value")), 2).as("rval"))
      val back = asofJoin(clicks, purchases, Seq("user_id"), "us", "rus",
        Seq("rval"))
        .select(col("event_id"), col("user_id"), col("us"),
          col("asof_rus").as("bus"), col("asof_rval").as("bval"))
      val fwd = asofJoinForward(clicks, purchases, Seq("user_id"), "us",
        "rus", Seq("rval"))
        .select(col("event_id"), col("asof_rus").as("fus"),
          col("asof_rval").as("fval"))
      back.join(fwd, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("us"),
          when(col("bus").isNull && col("fus").isNull, lit(-1L))
            .when(col("fus").isNull, col("bus"))
            .when(col("bus").isNull, col("fus"))
            .when(col("us") - col("bus") <= col("fus") - col("us"),
              col("bus"))
            .otherwise(col("fus")).as("nearest_us"),
          when(col("bus").isNull && col("fus").isNull, lit(-1.0))
            .when(col("fus").isNull, col("bval"))
            .when(col("bus").isNull, col("fval"))
            .when(col("us") - col("bus") <= col("fus") - col("us"),
              col("bval"))
            .otherwise(col("fval")).as("nearest_val"))
        .withColumn("delta_us",
          when(col("nearest_us") === -1L, lit(-1L))
            .otherwise(abs(col("us") - col("nearest_us"))))
        .orderBy("event_id")
    }),

    // Interval-OVERLAP join: each click's 10-minute attention window
    // against each same-user purchase's trailing 30-minute window —
    // interval×interval intersection planned as an equi-join on
    // (user, bin) with first-shared-bin dedupe (exactly-once pairs,
    // no distinct pass).
    "j14_interval_overlap" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("clo"))
        .withColumn("chi", col("clo") + 600000000L)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"))
        .withColumn("plo", col("pus") - 1800000000L)
      intervalOverlapJoin(clicks, purchases, Seq("user_id"),
          "clo", "chi", "plo", "pus", binWidth = 1800000000L)
        .select(col("event_id"), col("user_id"), col("clo"), col("pus"))
        .orderBy("event_id", "pus")
    }),

    // Range join: click events inside the 30-minute window trailing
    // each purchase of the same user — interval containment planned
    // as an equi-join on (user_id, time bin).
    "j10_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val win = 1800000000L // 30 min in µs
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"))
        .withColumn("plo", col("pus") - win)
      rangeJoinBinned(clicks, purchases, Seq("user_id"),
        "us", "plo", "pus", win)
        .select(col("event_id"), col("user_id"), col("us"), col("pus"))
        .orderBy("event_id", "pus")
    }),

    // Session DURATION analysis — st2's gap sessionization re-tuned to
    // where it is non-degenerate: st2 keeps the web-canonical 30-min
    // gap, which on this corpus (median inter-event gap ~7 h) makes
    // nearly every session a singleton; j11 sets the gap near the
    // median so multi-event sessions actually form, reports durations,
    // and carries the plan contract st2 leaves implicit — ONE user_id
    // exchange serves the lag, the running session-start sum AND the
    // per-session aggregation (hashpartitioning(user_id) satisfies the
    // (user_id, sid) clustering; spec-asserted exactly one hash
    // exchange in the executed plan). Sessions never straddle users,
    // so 10⁹ users parallelize perfectly.
    "j11_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 30000000000L
      t(s, d, "events").filter(col("user_id") < 50)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(unix_micros(col("ts"))).as("start_us"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("dur_us"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sid")
    })
  )

  val oracles: Map[String, String] = Map(
    "j9_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts) AS rus,
                 round(max(value), 2) AS rval
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
       SELECT l.event_id, l.user_id, l.us,
         r.rus AS prev_us, r.rval AS prev_val
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.us >= r.rus
       ORDER BY l.event_id""",
    // j16: both ASOF legs + the same integer tie rule (backward wins
    // equidistance); -1 encodes no-match like st16
    "j16_nearest_event" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts) AS rus,
                 round(max(value), 2) AS rval
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         b AS (SELECT l.event_id, l.user_id, l.us,
                 r.rus AS bus, r.rval AS bval
               FROM l ASOF LEFT JOIN r
                 ON l.user_id = r.user_id AND l.us >= r.rus),
         f AS (SELECT l.event_id, r.rus AS fus, r.rval AS fval
               FROM l ASOF LEFT JOIN r
                 ON l.user_id = r.user_id AND l.us <= r.rus),
         n AS (SELECT b.event_id, b.user_id, b.us,
             CASE WHEN bus IS NULL AND fus IS NULL THEN -1
                  WHEN fus IS NULL THEN bus
                  WHEN bus IS NULL THEN fus
                  WHEN b.us - bus <= fus - b.us THEN bus
                  ELSE fus END AS nearest_us,
             CASE WHEN bus IS NULL AND fus IS NULL THEN -1.0
                  WHEN fus IS NULL THEN bval
                  WHEN bus IS NULL THEN fval
                  WHEN b.us - bus <= fus - b.us THEN bval
                  ELSE fval END AS nearest_val
           FROM b JOIN f ON b.event_id = f.event_id)
       SELECT event_id, user_id, us, nearest_us, nearest_val,
         CASE WHEN nearest_us = -1 THEN -1
              ELSE abs(us - nearest_us) END AS delta_us
       FROM n ORDER BY event_id""",
    // j13: DuckDB ASOF with the inequality flipped (l.us <= r.rus)
    // is the forward/next-known-value direction
    "j13_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts) AS rus,
                 round(max(value), 2) AS rval
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
       SELECT l.event_id, l.user_id, l.us,
         r.rus AS next_us, r.rval AS next_val
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.us <= r.rus
       ORDER BY l.event_id""",
    "j14_interval_overlap" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS clo,
           epoch_us(ts) + 600000000 AS chi
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) - 1800000000 AS plo,
           epoch_us(ts) AS pus
           FROM events WHERE event_type = 'purchase')
       SELECT c.event_id, c.user_id, c.clo, p.pus
       FROM c JOIN p ON c.user_id = p.user_id
         AND c.clo <= p.pus AND p.plo <= c.chi
       ORDER BY c.event_id, p.pus""",
    "j10_range_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS pus
               FROM events WHERE event_type = 'purchase')
       SELECT c.event_id, c.user_id, c.us, p.pus
       FROM c JOIN p ON c.user_id = p.user_id
         AND c.us BETWEEN p.pus - 1800000000 AND p.pus
       ORDER BY c.event_id, p.pus""",
    "j11_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu
           FROM events WHERE user_id < 50),
         f AS (SELECT *, CASE WHEN lag(tu) OVER w IS NULL
                 OR tu - lag(tu) OVER w > 30000000000 THEN 1 ELSE 0 END
                 AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY tu, event_id)),
         g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                 ORDER BY tu, event_id ROWS UNBOUNDED PRECEDING)::bigint AS sid
               FROM f)
       SELECT user_id, sid, min(tu) AS start_us,
         max(tu) - min(tu) AS dur_us, count(*) AS n_events
       FROM g GROUP BY 1, 2 ORDER BY user_id, sid"""
  )
}
