package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of and range joins must agree with naive (quadratic) reference
  * joins, honor tolerance/tie semantics, and keep the scale shape
  * (one equi-shuffle, no nested loop). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches the naive per-row maximum-preceding lookup") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L),
      (3L, 50L, 103L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 6L, 4.0)).toDF("k", "rts", "rv")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("rv"))
      .select("lid", "asof_rts", "asof_rv").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // lid 100: ts 10 → right (1,10) matches (≤ tie included)
    // lid 101: ts 25 → (1,20); lid 102: ts 5 → none; lid 103: no key 3
    assert(got == Set(
      (100L, Some(10L), Some(1.0)),
      (101L, Some(20L), Some(2.0)),
      (102L, None, None),
      (103L, None, None)))
  }

  test("asofJoinForward: minimum-following lookup, ties and tolerance") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L),
      (3L, 50L, 103L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 3L, 4.0)).toDF("k", "rts", "rv")
    val got = Temporal.asofJoinForward(left, right, Seq("k"), "ts", "rts",
      Seq("rv"))
      .select("lid", "asof_rts", "asof_rv").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // lid 100: ts 10 → (1,10) — the ≥ tie matches; lid 101: ts 25 →
    // (1,30); lid 102: ts 5 → nothing at-or-after; lid 103: no key 3
    assert(got == Set(
      (100L, Some(10L), Some(1.0)),
      (101L, Some(30L), Some(3.0)),
      (102L, None, None),
      (103L, None, None)))
    // tolerance: a next-match further than tol ahead is nulled
    val tol = Temporal.asofJoinForward(left, right, Seq("k"), "ts", "rts",
      Seq("rv"), toleranceMicros = Some(3L))
      .select("lid", "asof_rv").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(tol(100L).contains(1.0)) // gap 0 ≤ 3
    assert(tol(101L).isEmpty)       // gap 5 > 3
  }

  test("asofJoin carries the matched row atomically when it has NULLs") {
    // the matched right row (rts=20) has rv=null; a per-column carry
    // would resurrect rv=5.0 from the OLDER rts=10 row — a (ts, value)
    // tuple that never existed
    val left = Seq((1L, 25L, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, Some(5.0)), (1L, 20L, None))
      .toDF("k", "rts", "rv")
    val r = Temporal.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("rv")).select("asof_rts", "asof_rv").collect().head
    assert(r.getLong(0) == 20L, "must match the rts=20 row")
    assert(r.isNullAt(1), "rv must stay the matched row's NULL")
  }

  test("asofJoin tolerance nulls out stale matches") {
    val left = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 95L, 7.0)).toDF("k", "rts", "rv")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("rv"), toleranceMicros = Some(10L))
      .select("lid", "asof_rv").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(7.0), 2L -> None)) // 200-95 > 10
  }

  test("rangeJoinBinned equals the naive inequality join at any binWidth") {
    val pts = (0L until 200L).map(i => (i % 5, i * 7 % 97, i))
      .toDF("k", "p", "lid")
    val ivs = (0L until 50L).map(i => (i % 5, i, i + i % 13))
      .toDF("k", "lo", "hi")
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("p").between(col("lo"), col("hi")))
      .select("lid", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (w <- Seq(1L, 7L, 64L)) {
      val got = Temporal.rangeJoinBinned(pts, ivs, Seq("k"),
        "p", "lo", "hi", w)
        .select("lid", "lo", "hi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == naive, s"binWidth=$w diverges")
    }
  }

  test("intervalOverlapJoin equals the naive join, exactly once, any width") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val iv = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 60L),
      Gen.choose(0L, 25L))
    val gen = for {
      nl <- Gen.choose(0, 25); nr <- Gen.choose(0, 25)
      ls <- Gen.listOfN(nl, iv); rs <- Gen.listOfN(nr, iv)
      bw <- Gen.oneOf(1L, 7L, 30L, 100L)
    } yield (ls, rs, bw)
    val prop = Prop.forAll(gen) { case (ls, rs, bw) =>
      val left = ls.zipWithIndex.map { case ((k, lo, w), i) =>
        (k, lo, lo + w, i.toLong) }.toDF("k", "llo", "lhi", "lid")
      val right = rs.zipWithIndex.map { case ((k, lo, w), i) =>
        (k, lo, lo + w, i.toLong) }.toDF("k", "rlo", "rhi", "rid")
      val got = Temporal.intervalOverlapJoin(left, right, Seq("k"),
        "llo", "lhi", "rlo", "rhi", bw)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val want = for {
        ((lk, llo, lw), li) <- ls.zipWithIndex
        ((rk, rlo, rw), ri) <- rs.zipWithIndex
        if lk == rk && llo <= rlo + rw && rlo <= llo + lw
      } yield (li.toLong, ri.toLong)
      // set equality AND no duplicates (first-shared-bin dedupe)
      got.sorted == want.sorted
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoin property: random data matches the naive quadratic lookup") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    } yield (ls, rs.distinct) // right unique per (key, ts) by contract
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rs.map { case (k, ts) => (k, ts, k * 1000.0 + ts) }
        .toDF("k", "rts", "rv")
      val got = Temporal.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("rv")).select("lid", "asof_rv").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val want = ls.zipWithIndex.map { case ((k, ts), i) =>
        val best = rs.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption
        i.toLong -> best.map { case (bk, bts) => bk * 1000.0 + bts }
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoin plans a single shuffle (window), not a join") {
    val ev = Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
      .agg(round(max(col("value")), 2).as("rval"))
    val df = Temporal.asofJoin(clicks, purchases, Seq("user_id"),
      "us", "rus", Seq("rval"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(!plan.contains("Join"), "as-of must not plan a join node")
    assert(plan.contains("Window"), "expected a window plan")
  }

  test("rangeJoinBinned plans an equi hash join, not a nested loop") {
    val ev = Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"))
      .withColumn("plo", col("pus") - 1800000000L)
    val df = Temporal.rangeJoinBinned(clicks, purchases, Seq("user_id"),
      "us", "plo", "pus", 1800000000L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(plan.contains("HashJoin"), "expected a hash join")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "range join must not plan a nested loop")
  }

  test("j11 sessionize: hand case + one user_id exchange reused end-to-end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // user 1: events at 0s, 10s, 40000s, 40010s → 2 sessions
    // user 2: one event → 1 one-event session
    val base = 1700000000000000L
    val rows = Seq(
      (1L, base, 1L), (2L, base + 10000000L, 1L),
      (3L, base + 40000000000L, 1L), (4L, base + 40010000000L, 1L),
      (5L, base, 2L))
    val dir = java.nio.file.Files.createTempDirectory("j11").toString
    rows.toDF("event_id", "us", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Temporal.queries("j11_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, base, 10000000L, 2L),
      (1L, 2L, base + 40000000000L, 10000000L, 2L),
      (2L, 1L, base, 0L, 1L)), s"sessions: $got")
    // plan: exactly ONE exchange (hashpartitioning on user_id) feeds
    // lag, the running sum and the session aggregation
    val df = graft.operators.Temporal.queries("j11_sessionize")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("j16 nearest: delta is the true per-click minimum, ties backward") {
    val got = operators.Temporal.queries("j16_nearest_event")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(5))).toMap
    // naive recount: per click, min |delta| over all same-user purchases
    val ev = Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("rus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    clicks.foreach { case (id, u, us) =>
      val (nUs, delta) = got(id)
      purch.get(u) match {
        case None => assert(nUs == -1L && delta == -1L, s"click $id")
        case Some(ts) =>
          val best = ts.map(t => math.abs(t - us)).min
          assert(delta == best, s"click $id: $delta != true min $best")
          // equidistant both sides -> the BACKWARD (earlier) ts wins
          val cands = ts.filter(t => math.abs(t - us) == best)
          if (cands.toSet.size > 1) assert(nUs == cands.min)
      }
    }
  }
}
