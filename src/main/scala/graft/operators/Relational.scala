package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage for SURVEY.md §2 — the surface MariaDB
  * provides in the reference (scans, projections, predicate shapes,
  * aggregates, joins, windows, set ops, scalar functions) re-expressed
  * as declarative Spark plans so Catalyst handles pushdown/pruning/join
  * selection.
  *
  * Conventions shared with the DuckDB oracles (driver hash-compares):
  *  - every double aggregate is rounded (sum order differs between
  *    engines; inputs have 2 decimals so round-2/4 is stable),
  *  - timestamps are emitted as unix micros or yyyy-MM-dd strings
  *    (parquet tz-adjustment + ns/µs truncation differ between engines),
  *  - every result carries a deterministic total ORDER BY.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Register `df` as a temp view whose name is SUFFIXED with the
    * dataset hash (the TextOps.fnCatalogView convention): two
    * concurrent query constructions on different sf dirs in one
    * SparkSession each see their own corpus — a fixed view name would
    * let one silently rebind the other's. Same-dataset replacement is
    * idempotent; views accumulate one per dataset, not per call. */
  private def dsView(df: DataFrame, base: String, d: String): String = {
    val v = base + "_" + Tables.datasetTag(d)
    df.createOrReplaceTempView(v)
    v
  }

  /** ts → bigint micros, stable across Spark(µs, UTC) and DuckDB. */
  private def micros(c: Column): Column = unix_micros(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: full table scan, all columns (timestamp as date string).
    // [ref: ha_mytile.cc:1599–1707 scan path; Spark: parquet batch scan]
    "s1_full_scan" -> ((s, d) => {
      t(s, d, "lineitem")
        .withColumn("l_shipdate", date_format(col("l_shipdate"), "yyyy-MM-dd"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P1: projection pushdown — scan must read only 2 columns.
    // [ref: ha_mytile.cc:3013–3021 read_set-driven buffers]
    "p1_projection" -> ((s, d) =>
      t(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
        .orderBy(col("l_orderkey"), col("l_extendedprice"))),

    // P4: range predicate on the clustering key → pushed to scan.
    // [ref: ha_mytile.cc:2509–2781 dim ranges]
    "p4_range_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey").between(100L, 500L))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // P5: attribute predicates (non-key columns), AND of comparisons.
    // [ref: QueryCondition, ha_mytile.cc:2509–2781]
    "p5_attr_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45.0 && col("l_discount") <= 0.02 &&
          col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    // P3: OR-combined predicates (reference combines QCs with TILEDB_OR).
    "p3_or_filter" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus") === "F" ||
          col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")),

    // P6: datetime range pushdown (constants converted to column unit).
    // [ref: cond_push_func_datetime ha_mytile.cc:2032–2310]
    "p6_datetime_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("ship_month")),

    // P9/P4: IN-list → point ranges, deduped.
    // [ref: get_unique_non_contained_in_ranges mytile-range.cc:647–819]
    "p9_in_list" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey").isin(1L, 5L, 7L, 7L, 11L, 42L, 99L))
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")),

    // P8: multiple ranges on one column intersected to the tightest.
    // [ref: merge_ranges mytile-range.h:220–300]
    "p8_range_merge" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") > 50L && col("o_orderkey") <= 900L &&
          col("o_orderkey") >= 100L && col("o_orderkey") < 800L)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // String predicates: equality + LIKE prefix (pushable) + suffix.
    "p_string_pred" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_brand") === "Brand#3" || col("p_type").startsWith("a"))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")),

    // IS NULL / IS NOT NULL semantics (reference recognizes but bails;
    // we evaluate them — nulls synthesized via outer join).
    "p_null_semantics" -> ((s, d) => {
      val n = t(s, d, "nation")
      val c = t(s, d, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .filter(col("n_cust").isNull || col("n_cust") > 2L)
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("n_nationkey")
    }),

    // A1/A3–A7: aggregate pushdown scope of the reference — SUM/AVG/
    // MIN/MAX/COUNT, no GROUP BY, single result row.
    // [ref: mytile_create_group_by_handler ha_mytile.cc:607–715]
    "a1_agg_nogroup" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        min(col("l_shipdate")).cast("date").cast("string").as("min_ship"),
        max(col("l_returnflag")).as("max_flag"),
        count(lit(1)).as("cnt"))),

    // A3+: grouped aggregation (TPC-H Q1 shape) — MariaDB's executor in
    // the reference, Spark partial+final HashAggregate here.
    "a3_groupby_q1" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // COUNT(DISTINCT) — exact distinct via expand+two-phase agg.
    "a4_count_distinct" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))),

    // HAVING → post-aggregation filter.
    "a5_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("n_orders") >= 3L)
        .orderBy("o_custkey")),

    // ROLLUP (grouping-sets family; MariaDB WITH ROLLUP equivalent).
    "a6_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("n"), col("qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // CUBE: all 2^k grouping combinations in one pass — Catalyst plans
    // a single Expand + hash aggregation (like MariaDB executed the
    // reference's GROUP BY WITH ROLLUP server-side, SURVEY §2.4).
    "a8_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("n"), col("qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Window-function family completion (§2.5): percent_rank /
    // cume_dist / nth_value / first / last over explicit ROWS frames.
    // The ordering key is made UNIQUE (qty, orderkey, linenumber), so
    // rank ratios are exact integer arithmetic — published raw, no
    // rounding needed — and frame endpoints are unambiguous in both
    // engines. Partitioned by returnflag: no global-order funnel.
    "w8_window_family" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") < 300)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val toCur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("l_quantity"), 2).as("qty"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          round(first(col("l_quantity")).over(toCur), 2).as("part_min"),
          round(last(col("l_quantity")).over(full), 2).as("part_max"),
          round(nth_value(col("l_quantity"), 2).over(full), 2).as("second_q"))
        .orderBy("l_returnflag", "qty", "l_orderkey", "l_linenumber")
    }),

    // IGNORE NULLS window family — the gap-fill surface w8 left out:
    // forward-fill (last_value IGNORE NULLS to current row — THE
    // canonical sensor/price imputation), previous-known (lag IGNORE
    // NULLS) and first-known. NULLs are injected deterministically
    // (%97 fixture, the sq4 convention — this corpus has none
    // organically) and published values are raw copies of stored
    // doubles (no arithmetic → no fold-order exposure), with -1.0
    // encoding "no known value yet" so sort keys and hashes stay
    // null-free. Per-customer partitions keep the window parallel.
    "w9_ignore_nulls" -> ((s, d) => {
      val v = dsView(t(s, d, "orders")
        .withColumn("price",
          when(col("o_orderkey") % 97 === 3, lit(null).cast("double"))
            .otherwise(col("o_totalprice"))), "w9_orders", d)
      s.sql(s"""SELECT o_custkey, o_orderkey,
          coalesce(price, -1.0) AS price,
          coalesce(last_value(price) IGNORE NULLS OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
            AS filled,
          coalesce(lag(price) IGNORE NULLS OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1.0)
            AS prev_known,
          coalesce(first_value(price) IGNORE NULLS OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1.0)
            AS first_known
        FROM $v WHERE o_custkey < 500
        ORDER BY o_custkey, o_orderkey""")
    }),

    // NOT IN vs NOT EXISTS under NULLs — the classic three-valued-
    // logic trap: one NULL in the NOT IN list makes EVERY membership
    // test UNKNOWN (zero rows), while NOT EXISTS keeps its two-valued
    // semantics. Catalyst plans the first as a NULL-AWARE anti join
    // (broadcast; the null check rides the join), the second as a
    // plain anti join — both single-pass, no per-row subquery.
    "sq4_not_in_nulls" -> ((s, d) => {
      val vc = dsView(t(s, d, "customer"), "sq4_customer", d)
      val vo = dsView(t(s, d, "orders"), "sq4_orders", d)
      // the UNION ALL NULL is a deterministic fixture (the d11 rule):
      // it guarantees the three-valued branch fires at every scale,
      // and "customers with no 300k+ order" keeps not_exists > 0 —
      // the two variants must SEPARATE or the trap isn't being shown
      s.sql(s"""SELECT 'not_exists' AS variant, count(*) AS n FROM (
          SELECT c_custkey FROM $vc c
          WHERE NOT EXISTS (SELECT 1 FROM $vo o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_totalprice > 300000))
        UNION ALL
        SELECT 'not_in' AS variant, count(*) AS n FROM (
          SELECT c_custkey FROM $vc
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM $vo WHERE o_totalprice > 300000
             UNION ALL SELECT CAST(NULL AS BIGINT)))
        ORDER BY variant""")
    }),

    // Datetime function surface (the MariaDB date-function parity
    // pack): trunc/extract/offset arithmetic evaluated per row at
    // scan speed; timestamps leave as strings / ints per the file
    // header convention. weekday is pinned to the 0=Monday convention
    // on BOTH engines (Spark weekday vs DuckDB isodow-1 — the 1=Sunday
    // default disagrees).
    "f3_datetime_funcs" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          weekday(col("o_orderdate")).cast("long").as("dow_mon0"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd")
            .as("plus_2m"),
          date_format(date_add(col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").as("plus_30d"))
        .orderBy("o_orderkey")),

    // Sketch-based distinct counting: approx_count_distinct (HLL++)
    // beside the exact count. At 100 TB the sketch is the only sane
    // path — fixed-size mergeable state, no expand-distinct shuffle —
    // while exact countDistinct rewrites to a two-phase aggregate over
    // the distinct keys. The sketch estimate is engine-specific, so
    // the published columns are the exact counts plus a FALSIFIABLE
    // relative-error flag (rsd 0.05 requested, 3× slack asserted): a
    // broken or bypassed sketch flips the flag, the hash-compared
    // numbers stay engine-neutral (the v18 no_deleted pattern).
    "a12_approx_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("a_ord"),
        approx_count_distinct(col("l_partkey"), 0.05).as("a_part"))
        .select(col("exact_orders"), col("exact_parts"),
          (abs(col("a_ord") - col("exact_orders")).cast("double") /
            col("exact_orders").cast("double") <= 0.15).as("orders_err_ok"),
          (abs(col("a_part") - col("exact_parts")).cast("double") /
            col("exact_parts").cast("double") <= 0.15).as("parts_err_ok"))
    }),

    // GROUPING SETS: the explicit, non-hierarchical grouping-set list —
    // the general form behind ROLLUP/CUBE. Catalyst plans ONE Expand +
    // a single hash aggregation (each input row is replicated once per
    // set map-side; no per-set rescan of the table), so the shape holds
    // at 100 TB exactly like a plain GROUP BY with 3× the rows.
    "a11_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("n"), col("qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // J1: equi-join small dim table — broadcast hash join, no shuffle of
    // the big side. [Spark analog of clustered-index lookup join J2]
    "j1_broadcast_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part").filter(col("p_size") >= 25)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // J2: multi-way join + group + top-k (TPC-H Q3 shape).
    "j2_multi_join_q3" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // J3: semi join (EXISTS).
    "j3_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J4: anti join (NOT EXISTS).
    "j4_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J5: outer join with null-producing side.
    "j5_outer_join" -> ((s, d) => {
      val n = t(s, d, "nation")
      val s2 = t(s, d, "supplier")
      n.join(s2, n("n_nationkey") === s2("s_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("s_name"), lit("none")).as("s_name"))
        .orderBy("n_nationkey", "s_name")
    }),

    // J6: row-value IN — (a,b) IN ((…),(…)); reference MRR path
    // [mysql-test/mytile/t/mrr.test:10–12]. Catalyst rewrites to
    // struct-IN; stays a pushable point-lookup set.
    "j6_rowvalue_in" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(struct(col("l_orderkey"), col("l_linenumber")).isin(
          struct(lit(1L), lit(1)), struct(lit(2L), lit(1)),
          struct(lit(3L), lit(2)), struct(lit(7L), lit(1))))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // W1: ranking window — top-3 orders per customer.
    "w1_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
        .orderBy("o_custkey", "rk", "o_orderkey")
    }),

    // W2: running aggregate window over event time.
    "w2_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .filter(col("user_id") < 20L)
        .select(col("user_id"), col("event_id"), micros(col("ts")).as("ts_us"),
          round(sum(col("value")).over(w), 2).as("running_value"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // W3: lag/lead — inter-event gap per user in microseconds.
    "w3_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .filter(col("user_id") < 10L)
        .select(col("user_id"), col("event_id"),
          (micros(col("ts")) - lag(micros(col("ts")), 1).over(w))
            .as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    // W4: bounded sliding frame — 3-row moving average per user
    // (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), the remaining frame
    // shape after w1 rank / w2 running / w3 lag.
    "w4_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "events")
        .filter(col("user_id") < 20L)
        .select(col("user_id"), col("event_id"), micros(col("ts")).as("ts_us"),
          round(avg(col("value")).over(w), 2).as("mavg"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // W6: RANGE-frame window (event-time, not row-count): per event,
    // count and sum over the trailing 1 hour of the SAME user — the
    // time-decayed-feature shape (sessions, rate limits, rolling
    // spend). The frame is defined on the µs value, so tie rows are
    // frame PEERS: the frame SET (hence n_1h, and sum_1h's value set)
    // is order-independent under ties; the double sum's ADDITION
    // order is engine-dependent like every grouped sum, absorbed by
    // the repo-wide round(2) convention (st1's rule). Partitioned by
    // user — no global-order funnel.
    "w6_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      t(s, d, "events")
        .filter(col("user_id") < 20L)
        .select(col("user_id"), col("event_id"),
          micros(col("ts")).as("ts_us"), col("value"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value")).over(w), 2).as("sum_1h"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // W5: distribution window functions — ntile / percent_rank /
    // cume_dist over per-user event history (partitioned, so no
    // global-order funnel; one shuffle serves all three).
    "w5_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .filter(col("user_id") < 10L)
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("user_id", "event_id")
    }),

    // UNPIVOT (melt): wide measure columns → (measure, val) rows —
    // Spark's Unpivot node, an Expand (row-generating projection), no
    // shuffle; the oracle replays as UNION ALL.
    "a10_unpivot" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 100L)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // ORDER BY + LIMIT (top-k; Spark TakeOrderedAndProject).
    "o1_orderby_limit" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)),

    // Set ops: UNION distinct / INTERSECT / EXCEPT.
    "set1_union" -> ((s, d) => {
      val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      val b = t(s, d, "orders").filter(col("o_totalprice") > 350000.0)
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    }),
    "set2_intersect" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").select(col("o_custkey").as("k"))
      a.intersect(b).orderBy("k")
    }),
    "set3_except" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").select(col("o_custkey").as("k"))
      a.except(b).orderBy("k")
    }),
    // ALL variants — different Catalyst rewrites from the DISTINCT
    // forms (multiplicity-preserving: replicated via count-difference
    // generate, not a semi/anti join).
    "set4_intersect_all" -> ((s, d) => {
      val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        .filter(col("k") < 200)
      val b = t(s, d, "customer").select(col("c_custkey").as("k"))
      a.intersectAll(b).orderBy("k")
    }),
    "set5_except_all" -> ((s, d) => {
      val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        .filter(col("k") < 200)
      val b = t(s, d, "customer").select(col("c_custkey").as("k"))
      a.exceptAll(b).orderBy("k")
    }),

    // Scalar function surface: arithmetic, CASE, string fns, cast,
    // coalesce, date parts — all codegen'd builtins.
    "f1_scalar_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          (col("o_totalprice") * 0.1 + 5.0).cast("decimal(18,4)")
            .cast("string").as("arith"),
          when(col("o_orderstatus") === "F", "final")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_word"),
          upper(substring(col("o_orderpriority"), 1, 4)).as("prio4"),
          concat(col("o_orderstatus"), lit("-"),
            col("o_orderpriority")).as("skey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .orderBy("o_orderkey")),

    // Correlated-style scalar subquery: orders above their customer's
    // average order value (decorrelated by Catalyst into a join).
    "sq1_scalar_subquery" -> ((s, d) => {
      val o = t(s, d, "orders")
      // the avg is ROUNDED before the comparison (both engines): an
      // unrounded double aggregate in a predicate is the one place the
      // file-header convention matters most — a 1-ulp sum-order
      // difference would flip rows across the threshold
      val avgs = o.groupBy("o_custkey")
        .agg(round(avg(col("o_totalprice")), 2).as("avg_price"))
      o.join(avgs, Seq("o_custkey"))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    // Correlated EXISTS / NOT EXISTS predicate subqueries — the SQL
    // front-door to semi/anti joins (j3/j4 build them explicitly; this
    // exercises Catalyst's RewritePredicateSubquery decorrelation):
    // customers with at least one high-value order and no open ('P')
    // order. Both subqueries decorrelate into one semi + one anti join
    // on c_custkey — no per-row re-execution at any scale.
    "sq2_exists_subquery" -> ((s, d) => {
      val vc = dsView(t(s, d, "customer"), "sq2_customer", d)
      val vo = dsView(t(s, d, "orders"), "sq2_orders", d)
      s.sql(s"""SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM $vc c
        WHERE EXISTS (SELECT 1 FROM $vo o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 350000)
          AND NOT EXISTS (SELECT 1 FROM $vo o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        ORDER BY c_custkey""")
    }),

    // LATERAL correlated subquery — the SQL front-door to per-row
    // top-k ("for each customer, its 2 largest orders"). Catalyst
    // decorrelates the correlated ORDER BY + LIMIT into a window
    // rank over ONE join (DecorrelateInnerQuery) — no per-customer
    // re-execution, so the shape is a single shuffle at any scale.
    // Ordering ranks the raw parquet doubles (identical bits in both
    // engines); only the published price is rounded.
    "sq3_lateral_join" -> ((s, d) => {
      val vc = dsView(t(s, d, "customer"), "sq3_customer", d)
      val vo = dsView(t(s, d, "orders"), "sq3_orders", d)
      s.sql(s"""SELECT c.c_custkey, o.o_orderkey,
          round(o.o_totalprice, 2) AS price
        FROM $vc c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM $vo o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey, price DESC, o_orderkey""")
    }),

    // RECURSIVE CTE (WITH RECURSIVE, the SQL:1999 surface Spark 4
    // finally ships): a linked-list walk down each customer's
    // chronological order chain, accumulating hop index and running
    // spend. Deliberately ACYCLIC — Spark's recursion is UNION
    // ALL-only (probed: UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so
    // cyclic reachability stays on d5's pointer-doubled CC; the
    // recursion here terminates at the chain length (≤18 on this
    // corpus, far under the level limit). The oracle replays via an
    // INDEPENDENT formulation (window cumsum) — a cross-check, not an
    // echo. cum is rounded at 2dp: sums of exact 2-decimal prices are
    // decimal-grid values, so no fold order can create a .005 tie.
    // Scale: each recursion level is one equi-join of the frontier
    // (one row per live chain) against the rk-indexed side — frontier
    // size only ever shrinks; nothing quadratic.
    "sq5_recursive_cte" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // materialize the chain ONCE — every recursion level re-joins
      // this side. (Floor note, round 10 — SCALE.md "Recursive CTE
      // per-level floor": ~0.09 s/LEVEL of planner+scheduler machinery
      // on Spark 4.1.2, measured across five variants. The isolated
      // recursion leg improves under coalesce(1)+BROADCAST (2.33 →
      // 1.86 s hot on a prebuilt view), but no variant survived the
      // full-query envelope in a real Bench artifact — the extra
      // build shuffle / per-level broadcast jobs eat the gain — so
      // the simple 32-partition form stays and the floor is the
      // documented engine constant.)
      val v = dsView(t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("rk", row_number().over(w))
        .localCheckpoint(), "sq5_chain", d)
      s.sql(s"""WITH RECURSIVE walk(o_custkey, o_orderkey, hop, cum) AS (
          SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT), o_totalprice
          FROM $v WHERE rk = 1
          UNION ALL
          SELECT n.o_custkey, n.o_orderkey, w.hop + 1,
            w.cum + n.o_totalprice
          FROM walk w JOIN $v n
            ON n.o_custkey = w.o_custkey AND n.rk = w.hop + 1)
        SELECT o_custkey, o_orderkey, hop, round(cum, 2) AS cum_price
        FROM walk ORDER BY o_custkey, hop""")
    }),

    // PIVOT: per-year revenue pivoted by order status — Spark's
    // groupBy().pivot() with an EXPLICIT value list (no extra
    // distinct-values scan job; one hash aggregation, conditional
    // sums evaluated map-side).
    "a9_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("yr")),

    // J7: six-table join (TPC-H Q5 shape) — join-order/CBO exercise;
    // local-supplier condition c_nationkey = s_nationkey.
    "j7_q5_local_supplier" -> ((s, d) => {
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .join(c, n("n_nationkey") === c("c_nationkey"))
        .join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // A8: exact interpolated percentiles (median + p90) per group.
    "a7_percentile" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
        .orderBy("l_returnflag")),

    // Scalar breadth: JSON field extraction + regexp over strings.
    "f2_json_regexp" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          regexp_extract(col("event_type"), "([a-z]+)", 1).as("word"))
        .filter(col("k") > 90)
        .orderBy("event_id")),

    // Grouped collection: sorted list aggregation rendered as string
    // (array outputs don't hash stably across engines).
    "g1_collect_sorted" -> ((s, d) =>
      t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"), count(lit(1)).as("n"))
        .orderBy("n_regionkey")),

    // P7 analog: spatial MBR intersection as range pushdown on x/y
    // columns. [ref: cond_push_func_spatial ha_mytile.cc:2312–2507 —
    // constant geometry's MBR → BETWEEN on _X/_Y dims]
    "p7_spatial_mbr" -> ((s, d) =>
      t(s, d, "part")
        .filter(graft.functions.Geo.mbrIntersects(
          col("p_size").cast("double"), col("p_retailprice"),
          10.0, 40.0, 500.0, 1500.0))
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_partkey")),

    // Spatial JOIN (point-in-rectangle) — p7 pushes a spatial
    // predicate into ONE scan; this joins a point table against a
    // rectangle table with the j10/j14 bin trick lifted to 2D: points
    // key by their single (bx, by) grid cell, rectangles explode to
    // every cell they cover, and a plain equi-join + exact containment
    // filter does the rest. Exactly-once is STRUCTURAL here — a point
    // lives in exactly one cell, so no dedupe pass at all (simpler
    // than j14's interval×interval first-shared-bin rule). Replication
    // is bounded by (w/binW + 1)(h/binH + 1) per rectangle; nothing
    // cartesian. Points: (p_size, p_retailprice); rectangles derived
    // deterministically from supplier keys.
    "j15_spatial_join" -> ((s, d) => {
      val wx = 5.0
      val wy = 200.0
      val pts = t(s, d, "part").select(col("p_partkey"),
        col("p_size").cast("double").as("px"),
        col("p_retailprice").as("py"))
        .withColumn("bx", floor(col("px") / wx).cast("long"))
        .withColumn("by", floor(col("py") / wy).cast("long"))
      val rects = t(s, d, "supplier").select(col("s_suppkey"),
        ((col("s_suppkey") % 40) + 1).cast("double").as("x0"),
        (lit(900.0) + (col("s_suppkey") % 5).cast("double") * 200.0)
          .as("y0"))
        .withColumn("x1", col("x0") + 6.0)
        .withColumn("y1", col("y0") + 250.0)
        .withColumn("bx", explode(sequence(
          floor(col("x0") / wx).cast("long"),
          floor(col("x1") / wx).cast("long"))))
        .withColumn("by", explode(sequence(
          floor(col("y0") / wy).cast("long"),
          floor(col("y1") / wy).cast("long"))))
      pts.join(rects, Seq("bx", "by"))
        .filter(col("px") >= col("x0") && col("px") <= col("x1") &&
          col("py") >= col("y0") && col("py") <= col("y1"))
        .select("s_suppkey", "p_partkey", "px", "py")
        .orderBy("s_suppkey", "p_partkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_full_scan" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "p1_projection" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_extendedprice",
    "p4_range_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey BETWEEN 100 AND 500 ORDER BY l_orderkey, l_linenumber""",
    "p5_attr_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity > 45.0 AND l_discount <= 0.02 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "p3_or_filter" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' OR o_totalprice > 400000.0 ORDER BY o_orderkey""",
    "p6_datetime_pushdown" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, count(*) AS n,
         round(sum(l_quantity), 2) AS qty FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
         GROUP BY 1 ORDER BY ship_month""",
    "p9_in_list" ->
      """SELECT p_partkey, p_name, p_size FROM part
         WHERE p_partkey IN (1, 5, 7, 7, 11, 42, 99) ORDER BY p_partkey""",
    "p8_range_merge" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey > 50 AND o_orderkey <= 900 AND o_orderkey >= 100
         AND o_orderkey < 800 ORDER BY o_orderkey""",
    "p_string_pred" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE p_brand = 'Brand#3' OR p_type LIKE 'a%' ORDER BY p_partkey""",
    "p_null_semantics" ->
      """SELECT n_nationkey, n_name, coalesce(n_cust, 0) AS n_cust
         FROM nation LEFT JOIN
         (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
         ON n_nationkey = c_nationkey
         WHERE n_cust IS NULL OR n_cust > 2 ORDER BY n_nationkey""",
    "a1_agg_nogroup" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         strftime(cast(min(l_shipdate) AS date), '%Y-%m-%d') AS min_ship,
         max(l_returnflag) AS max_flag, count(*) AS cnt FROM lineitem""",
    "a3_groupby_q1" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "a4_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows FROM lineitem""",
    "a5_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""",
    "a6_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
         coalesce(l_linestatus, '(all)') AS l_linestatus,
         count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "a8_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
         coalesce(l_linestatus, '(all)') AS l_linestatus,
         count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "w8_window_family" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
         round(l_quantity, 2) AS qty,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         round(first_value(l_quantity) OVER
           (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS part_min,
         round(last_value(l_quantity) OVER
           (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
           AS part_max,
         round(nth_value(l_quantity, 2) OVER
           (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
           AS second_q
         FROM lineitem WHERE l_orderkey < 300
         WINDOW w AS (PARTITION BY l_returnflag
           ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, qty, l_orderkey, l_linenumber""",
    "sq4_not_in_nulls" ->
      """SELECT 'not_exists' AS variant, count(*) AS n FROM (
           SELECT c_custkey FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 300000))
         UNION ALL
         SELECT 'not_in' AS variant, count(*) AS n FROM (
           SELECT c_custkey FROM customer
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders WHERE o_totalprice > 300000
              UNION ALL SELECT CAST(NULL AS BIGINT)))
         ORDER BY variant""",
    "f3_datetime_funcs" ->
      """SELECT o_orderkey,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
           AS month_start,
         date_diff('day', DATE '1995-01-01', o_orderdate::date)::bigint
           AS days_since,
         strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
         quarter(o_orderdate)::bigint AS qtr,
         (isodow(o_orderdate) - 1)::bigint AS dow_mon0,
         strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2m,
         strftime(o_orderdate::date + 30, '%Y-%m-%d') AS plus_30d
         FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""",
    // a12: exact counts replay; the sketch-error flags are the
    // documented deterministic contract (HLL++ at rsd 0.05 with 3×
    // slack on these cardinalities)
    "a12_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
         count(DISTINCT l_partkey) AS exact_parts,
         TRUE AS orders_err_ok, TRUE AS parts_err_ok
         FROM lineitem""",
    "a11_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
         coalesce(l_linestatus, '(all)') AS l_linestatus,
         count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag, l_linestatus""",
    "j1_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size >= 25 GROUP BY p_brand ORDER BY p_brand""",
    "j2_multi_join_q3" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "j3_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         AND o_totalprice > 300000.0) ORDER BY c_custkey""",
    "j4_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "j5_outer_join" ->
      """SELECT n_nationkey, n_name, coalesce(s_name, 'none') AS s_name
         FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
         ORDER BY n_nationkey, s_name""",
    "j6_rowvalue_in" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE (l_orderkey, l_linenumber) IN ((1,1),(2,1),(3,2),(7,1))
         ORDER BY l_orderkey, l_linenumber""",
    "w1_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) x
         WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""",
    "w2_window_running" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
         FROM events WHERE user_id < 20 ORDER BY user_id, ts_us, event_id""",
    "w3_window_lag" ->
      """SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS gap_us
         FROM events WHERE user_id < 10 ORDER BY user_id, event_id""",
    "w4_moving_avg" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mavg
         FROM events WHERE user_id < 20 ORDER BY user_id, ts_us, event_id""",
    "w6_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         count(*) OVER w AS n_1h,
         round(sum(value) OVER w, 2) AS sum_1h
         FROM events WHERE user_id < 20
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_us, event_id""",
    "w5_ntile" ->
      """SELECT user_id, event_id,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
         FROM events WHERE user_id < 10
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "a10_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS measure, v AS val
         FROM (
           SELECT l_orderkey, l_linenumber,
             'l_quantity' AS m, l_quantity AS v FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber,
             'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber,
             'l_discount', l_discount FROM lineitem)
         WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber, measure""",
    "o1_orderby_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""",
    "set1_union" ->
      """SELECT DISTINCT k FROM (
           SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
           UNION ALL
           SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000.0) x
         ORDER BY k""",
    "set2_intersect" ->
      """SELECT c_custkey AS k FROM customer
         INTERSECT SELECT o_custkey FROM orders ORDER BY k""",
    "set3_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT SELECT o_custkey FROM orders ORDER BY k""",
    "set4_intersect_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_custkey < 200
         INTERSECT ALL SELECT c_custkey FROM customer ORDER BY k""",
    "set5_except_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_custkey < 200
         EXCEPT ALL SELECT c_custkey FROM customer ORDER BY k""",
    "f1_scalar_funcs" ->
      """SELECT o_orderkey,
         cast(cast(o_totalprice * 0.1 + 5.0 AS decimal(18,4)) AS varchar) AS arith,
         CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
           ELSE 'other' END AS status_word,
         upper(substr(o_orderpriority, 1, 4)) AS prio4,
         o_orderstatus || '-' || o_orderpriority AS skey,
         year(o_orderdate) AS yr, month(o_orderdate) AS mo
         FROM orders ORDER BY o_orderkey""",
    "sq1_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders o
         JOIN (SELECT o_custkey AS ck, round(avg(o_totalprice), 2) AS avg_price
               FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
         WHERE o_totalprice > avg_price * 1.5 ORDER BY o_orderkey""",
    "sq2_exists_subquery" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 350000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'P')
         ORDER BY c_custkey""",
    "sq3_lateral_join" ->
      """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_mktsegment = 'MACHINERY'
         ORDER BY c_custkey, price DESC, o_orderkey""",
    // w9: DuckDB's IGNORE NULLS is the same SQL:2011 clause; the NULL
    // fixture re-derives from o_orderkey
    "w9_ignore_nulls" ->
      """WITH w9 AS (SELECT o_custkey, o_orderkey, o_orderdate,
           CASE WHEN o_orderkey % 97 = 3 THEN NULL
                ELSE o_totalprice END AS price
         FROM orders WHERE o_custkey < 500)
       SELECT o_custkey, o_orderkey,
         coalesce(price, -1.0) AS price,
         coalesce(last_value(price IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
           AS filled,
         coalesce(lag(price IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1.0)
           AS prev_known,
         coalesce(first_value(price IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1.0)
           AS first_known
       FROM w9 ORDER BY o_custkey, o_orderkey""",
    // sq5: independent window-cumsum formulation cross-checks the
    // recursion (rounding is tie-free: sums of 2-decimal prices sit
    // on the decimal grid under any fold order)
    "sq5_recursive_cte" ->
      """WITH c AS (SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rk
         FROM orders WHERE o_custkey < 100)
       SELECT o_custkey, o_orderkey, rk::bigint AS hop,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY rk
           ROWS UNBOUNDED PRECEDING), 2) AS cum_price
       FROM c ORDER BY o_custkey, hop""",
    "a9_pivot" ->
      """SELECT year(o_orderdate) AS yr,
         round(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS F,
         round(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS O,
         round(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 2) AS P
         FROM orders GROUP BY 1 ORDER BY yr""",
    // j15: the oracle is the plain containment join — the grid is an
    // execution detail, not semantics
    "j15_spatial_join" ->
      """WITH r AS (SELECT s_suppkey,
           (s_suppkey % 40 + 1)::double AS x0,
           900.0 + (s_suppkey % 5)::double * 200.0 AS y0
         FROM supplier)
       SELECT r.s_suppkey, p.p_partkey,
         p.p_size::double AS px, p.p_retailprice AS py
       FROM part p JOIN r
         ON p.p_size::double BETWEEN r.x0 AND r.x0 + 6.0
        AND p.p_retailprice BETWEEN r.y0 AND r.y0 + 250.0
       ORDER BY s_suppkey, p_partkey""",
    "p7_spatial_mbr" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part
         WHERE p_size BETWEEN 10.0 AND 40.0
         AND p_retailprice BETWEEN 500.0 AND 1500.0
         ORDER BY p_partkey""",
    "j7_q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n
         FROM region JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "a7_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90,
         round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "f2_json_regexp" ->
      """SELECT event_id, json_extract(props, '$.k')::int AS k,
         regexp_extract(event_type, '([a-z]+)', 1) AS word
         FROM events WHERE json_extract(props, '$.k')::int > 90
         ORDER BY event_id""",
    "g1_collect_sorted" ->
      """SELECT n_regionkey,
         array_to_string(list_sort(list(n_name)), ',') AS nations,
         count(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
  )
}
