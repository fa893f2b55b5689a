package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("runningSumPerUser accumulates per user in (ts, event_id) order") {
    val events = Seq(
      (1L, 10L, 100L, 1.0), (2L, 10L, 200L, 2.0), (3L, 20L, 150L, 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = RelationalOps.runningSumPerUser(events).orderBy("event_id")
      .select("running_value").as[Double].collect()
    assert(r.toSeq === Seq(1.0, 3.0, 5.0))
  }

  test("eventsTumblingAgg buckets long-nanos timestamps into aligned hours") {
    val h = 3600L * 1000 * 1000 * 1000 // one hour in nanos
    val events = Seq(
      (1L, 0L, "a", 1.0, "{}"), (2L, h - 1, "a", 2.0, "{}"), (3L, h, "a", 4.0, "{}")
    ).toDF("event_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsTumblingAgg(events)
      .select("n_events", "sum_value").as[(Long, Double)].collect().toSet
    assert(r === Set((2L, 3.0), (1L, 4.0)))
  }

  test("extractJsonK pulls integer props; malformed rows dropped") {
    val events = Seq(
      (1L, """{"k": 87}"""), (2L, """{"k":-3}"""), (3L, """{"x": 1}""")
    ).toDF("event_id", "props")
    val r = RelationalOps.extractJsonK(events)
      .select("event_id", "k").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 87L), (2L, -3L)))
  }

  test("sessionize splits on inactivity gaps per user") {
    val m = 60L * 1000 * 1000 * 1000 // one minute in nanos
    val events = Seq(
      (1L, 1L, 0L), (2L, 1L, 10 * m), (3L, 1L, 50 * m), // gap > 30min before 3
      (4L, 2L, 0L)
    ).toDF("event_id", "user_id", "ts")
    val r = RelationalOps.sessionize(events).orderBy("event_id")
      .select("session_idx").as[Long].collect()
    assert(r.toSeq === Seq(1L, 1L, 2L, 1L))
  }

  test("sessionsOverlap: binned equi-join candidates reproduce the naive theta join") {
    val m = 60L * 1000 * 1000 * 1000 // one minute in nanos
    // user 1: one 3-event session spanning an hour boundary; users
    // 2–4: sessions overlapping it, touching it exactly, and far away
    val events = Seq(
      (1L, 1L, 40 * m), (2L, 1L, 55 * m), (3L, 1L, 70 * m), // heavy: [40, 70]
      (4L, 2L, 50 * m), (5L, 2L, 60 * m),                   // overlaps: [50, 60]
      (6L, 3L, 70 * m),                                     // touches at 70 → overlap 0
      (7L, 4L, 300 * m), (8L, 4L, 310 * m)                  // disjoint
    ).toDF("event_id", "user_id", "ts")
    val r = RelationalOps.sessionsOverlap(events)
      .collect()
      .map(x => (x.getAs[Long]("a_user"), x.getAs[Long]("b_user"),
        x.getAs[Long]("overlap_us"))).toSet
    assert(r === Set((1L, 2L, 10 * m / 1000), (1L, 3L, 0L)))
    // naive twin over the same sessions (µs axis) — must agree exactly
    val sess = RelationalOps.sessionIntervals(
      events.withColumn("ts", expr("ts div 1000")), gapTicks = 1800L * 1000 * 1000)
    val a = sess.filter($"n_events" >= 3)
      .select($"user_id".as("au"), $"start_ts".as("as"), $"end_ts".as("ae"))
    val b = sess.select($"user_id".as("bu"), $"start_ts".as("bs"), $"end_ts".as("be"))
    val naive = a.crossJoin(b)
      .filter($"au" =!= $"bu" && $"as" <= $"be" && $"bs" <= $"ae")
      .select($"au", $"bu", (least($"ae", $"be") - greatest($"as", $"bs")).as("ov"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === naive)
  }

  test("funnelDepth: strict ordering — purchase before view is depth 0 at that stage") {
    val us = 1000L // µs → nanos (op truncates ts div 1000 to the µs axis)
    val events = Seq(
      // user 10: clean view → click → purchase, in order → depth 3
      (10L, 100 * us, "view"), (10L, 200 * us, "click"), (10L, 300 * us, "purchase"),
      // user 20: purchase BEFORE its first view → the purchase must not
      // count; only the view does → depth 1
      (20L, 100 * us, "purchase"), (20L, 200 * us, "view"),
      // user 30: click SIMULTANEOUS with the view (strict > between
      // stages) → click doesn't count → depth 1
      (30L, 100 * us, "view"), (30L, 100 * us, "click"),
      // user 40: click with no view at all → depth 0
      (40L, 100 * us, "click"),
      // user 50: out-of-order input rows; earliest qualifying click is
      // the one AFTER the first view (400), and the purchase at 350
      // precedes it → depth 2
      (50L, 300 * us, "view"), (50L, 100 * us, "click"),
      (50L, 400 * us, "click"), (50L, 350 * us, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = RelationalOps.funnelDepth(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("funnel_depth"),
          Option(x.get(x.fieldIndex("t2_us"))).map(_.asInstanceOf[Long]))).toMap
    assert(r(10L) === ((3L, Some(200L))))
    assert(r(20L) === ((1L, None)))
    assert(r(30L) === ((1L, None)))
    assert(r(40L) === ((0L, None)))
    assert(r(50L) === ((2L, Some(400L))))
  }

  test("rollupPricing emits leaf, subtotal, and grand-total rows") {
    val li = Seq(("A", "F", 1.0), ("A", "O", 2.0), ("R", "F", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val r = RelationalOps.rollupPricing(li)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r(("A", "F")) === 1.0)
    assert(r(("A", "ALL")) === 3.0)
    assert(r(("ALL", "ALL")) === 7.0)
    assert(!r.contains(("ALL", "F"))) // rollup, not cube
  }

  test("revenueBySegment joins three tables and aggregates") {
    val customer = Seq((1, "c1", 0, 0.0, "AUTO")).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((10L, 1L, "O", 5.0)).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq((10L, 100.0, 0.1), (10L, 50.0, 0.0)).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val r = RelationalOps.revenueBySegment(customer, orders, lineitem).head()
    assert(r.getAs[String]("c_mktsegment") === "AUTO")
    assert(r.getAs[Double]("revenue") === 140.0) // 100*0.9 + 50
    assert(r.getAs[Long]("n_items") === 2L)
  }

  test("asofJoin matches the latest right row at-or-before each left ts, per key") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 250L), (3L, 2L, 50L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, 100L, 1.0), // equal ts → matches (>= semantics)
      (11L, 1L, 200L, 2.0),
      (12L, 1L, 200L, 3.0), // same ts as 11: larger tieBreak wins
      (13L, 2L, 60L, 9.0) // after left ts 50 → user 2 unmatched
    ).toDF("rid", "user_id", "ts", "value")
    val out = RelationalOps.asofJoin(left, right, "user_id", "ts", tieBreak = "rid")
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("asof_rid") === 10L) // ts 100 matches equal-ts view
    assert(out(1).getAs[Long]("asof_rid") === 12L) // 200-tie broken by larger rid
    assert(out(2).isNullAt(out(2).fieldIndex("asof_rid"))) // no prior right row
  }

  test("purchaseAttribution: purchases carry their latest prior view and the gap") {
    val ev = Seq( // ts in nanos; op matches at µs granularity
      (1L, 100000L, 7L, "view", 0.5, "{}"),
      (2L, 300000L, 7L, "purchase", 9.9, "{}"),
      (3L, 200000L, 7L, "view", 0.7, "{}"),
      (4L, 50000L, 8L, "purchase", 1.0, "{}") // user 8 never viewed
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = RelationalOps.purchaseAttribution(ev).orderBy("event_id").collect()
    assert(out(0).getAs[Long]("view_event_id") === 3L) // latest view before ts 300µs
    assert(out(0).getAs[Long]("gap_us") === 100L)
    assert(out(0).getAs[Double]("view_value") === 0.7)
    assert(out(1).isNullAt(out(1).fieldIndex("view_event_id")))
  }

  test("revenueByRegion rolls the fact through the dimension chain") {
    val li = Seq((1L, 10L, 100.0, 0.1), (2L, 20L, 50.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((10L, 5L, "s1"), (20L, 6L, "s2"))
      .toDF("s_suppkey", "s_nationkey", "s_name")
    val nat = Seq((5L, 1L, "FRANCE"), (6L, 2L, "JAPAN"))
      .toDF("n_nationkey", "n_regionkey", "n_name")
    val reg = Seq((1L, "EUROPE"), (2L, "ASIA")).toDF("r_regionkey", "r_name")
    val out = RelationalOps.revenueByRegion(li, sup, nat, reg).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === Map("EUROPE" -> 90.0, "ASIA" -> 50.0))
  }

  test("eventTypePivot emits a dense count column per declared type") {
    val ev = Seq(
      (1L, 0L, 7L, "click", 0.0, "{}"), (2L, 0L, 7L, "click", 0.0, "{}"),
      (3L, 0L, 7L, "view", 0.0, "{}"), (4L, 0L, 8L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = RelationalOps.eventTypePivot(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows(7L).getAs[Long]("n_click") === 2L)
    assert(rows(7L).getAs[Long]("n_view") === 1L)
    assert(rows(7L).getAs[Long]("n_purchase") === 0L) // absent type → dense 0
    assert(rows(8L).getAs[Long]("n_purchase") === 1L)
  }

  test("valueBandJoin finds exactly the within-eps pairs, across bin boundaries too") {
    val ev = Seq(
      (1L, 0L, 1L, "purchase", 0.100, "{}"),
      (2L, 0L, 1L, "purchase", 0.120, "{}"),  // same bin as 1 (|diff|=0.02)
      (3L, 0L, 1L, "purchase", 0.149, "{}"),  // adjacent bin vs 2 (0.149 in bin 2)
      (4L, 0L, 1L, "purchase", 0.400, "{}"),  // far from everything
      (5L, 0L, 1L, "view", 0.101, "{}")       // wrong type — excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val pairs = RelationalOps.valueBandJoin(ev, eps = 0.05).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // (1,2) same-bin; (2,3) adjacent-bin |diff|=0.029; (1,3) |diff|=0.049 adjacent
    assert(pairs === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("winsorizeCounts: tails counted against rounded per-type bounds") {
    val ev = (1 to 100).map(i =>
      (i.toLong, 0L, 1L, "view", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.winsorizeCounts(ev).collect()
    assert(r.length === 1)
    val row = r.head
    // exact percentile of 1..100: p05 = 5.95, p95 = 95.05 (linear interp)
    assert(math.abs(row.getAs[Double]("p05") - 5.95) < 1e-9)
    assert(math.abs(row.getAs[Double]("p95") - 95.05) < 1e-9)
    assert(row.getAs[Long]("n_below") === 5L) // values 1..5
    assert(row.getAs[Long]("n_above") === 5L) // values 96..100
    assert(row.getAs[Long]("n_total") === 100L)
  }

  test("hourlyGapFill: every (type, hour) cell present; missing hours are explicit zeros") {
    val hr = 3600L * 1000 * 1000 * 1000
    val ev = Seq(
      (1L, 0L * hr, 1L, "view", 1.0, "{}"),
      (2L, 0L * hr + 7, 1L, "view", 1.0, "{}"),
      (3L, 3L * hr, 1L, "view", 1.0, "{}"),      // hours 1-2 are gaps
      (4L, 1L * hr, 1L, "purchase", 1.0, "{}")   // purchase misses hours 0,2,3
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = RelationalOps.hourlyGapFill(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // dense grid: 2 types × 4 hours
    assert(rows.size === 8)
    assert(rows(("view", 0L)) === 2L && rows(("view", 3L)) === 1L)
    assert(rows(("view", 1L)) === 0L && rows(("view", 2L)) === 0L)
    assert(rows(("purchase", 1L)) === 1L)
    assert(Seq(0L, 2L, 3L).forall(h => rows(("purchase", h)) === 0L))
  }

  test("scd2UserState: change points become versioned validity intervals") {
    // ts in nanos; validity bounds come out on the µs axis (div 1000)
    val ev = Seq(
      (1L, 100000L, 7L, "view", 0.0, "{}"),
      (2L, 200000L, 7L, "view", 0.0, "{}"),  // same state — collapsed
      (3L, 300000L, 7L, "cart", 0.0, "{}"),  // change point
      (4L, 400000L, 7L, "view", 0.0, "{}"),  // change back = new version
      (5L, 150000L, 8L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.scd2UserState(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(r.size === 4) // 3 versions for user 7, 1 for user 8
    assert(r((7L, 1L)).getAs[String]("state") === "view")
    assert(r((7L, 1L)).getAs[Long]("valid_from") === 100L)
    assert(r((7L, 1L)).getAs[Long]("valid_to") === 300L)
    assert(!r((7L, 1L)).getAs[Boolean]("is_current"))
    assert(r((7L, 2L)).getAs[String]("state") === "cart")
    assert(r((7L, 3L)).getAs[String]("state") === "view")
    assert(r((7L, 3L)).isNullAt(r((7L, 3L)).fieldIndex("valid_to")))
    assert(r((7L, 3L)).getAs[Boolean]("is_current"))
    assert(r((8L, 1L)).getAs[Boolean]("is_current"))
  }

  test("approxStatsCheck: exact counts with in-tolerance sketches") {
    val ev = (0 until 2000).map { i =>
      (i.toLong, i.toLong, (i % 137).toLong, if (i % 2 == 0) "view" else "click",
        (i % 97).toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = RelationalOps.approxStatsCheck(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.keySet === Set("view", "click"))
    // 137 distinct user_ids split across both types; every id hits both
    assert(rows("view").getAs[Long]("exact_distinct") === 137L)
    assert(rows.values.forall(_.getAs[Boolean]("approx_distinct_ok")))
    assert(rows.values.forall(_.getAs[Boolean]("approx_p50_ok")))
  }

  test("lagFeatures: lag/delta/rolling mean over one user-ordered window") {
    val ev = Seq(
      (0L, 10L, 1L, 2.0), (1L, 20L, 1L, 4.0), (2L, 30L, 1L, 9.0),
      (3L, 15L, 2L, 5.0)
    ).map { case (id, ts, u, v) => (id, ts, u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.lagFeatures(ev).collect()
      .map(x => x.getAs[Long]("event_id") -> x).toMap
    assert(r(0L).getAs[Any]("prev_value") === null) // stream head
    assert(r(1L).getAs[Double]("delta") === 2.0)
    assert(r(2L).getAs[Double]("delta") === 5.0)
    assert(r(2L).getAs[Double]("rolling_avg3") === 5.0) // (2+4+9)/3
    assert(r(1L).getAs[Double]("rolling_avg3") === 3.0) // (2+4)/2 — partial frame
    assert(r(3L).getAs[Double]("rolling_avg3") === 5.0) // other user, own frame
  }

  test("valueHistogram: equal-width bins, max value lands in the top bin") {
    // values 0..10 over 20 bins of width 0.5: value v → bin 2v, 10 → 19
    val ev = (0 to 10).map(v =>
      (v.toLong, v.toLong, v.toLong, "view", v.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val bins = RelationalOps.valueHistogram(ev).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins.values.sum === 11L)
    assert(bins(0L) === 1L && bins(2L) === 1L && bins(18L) === 1L)
    assert(bins(19L) === 1L) // the max value caps into the top bin
    assert(!bins.contains(1L)) // odd bins are empty (integer values, width 0.5)
    // degenerate type: single constant value → everything in bin 0
    val const = Seq((0L, 0L, 0L, "click", 7.7, "{}"), (1L, 1L, 1L, "click", 7.7, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cb = RelationalOps.valueHistogram(const).collect()
    assert(cb.length === 1 && cb(0).getAs[Long]("bin") === 0L && cb(0).getAs[Long]("n") === 2L)
  }

  test("madOutliers: median/MAD survive the outlier that drags the z-screen") {
    // 1..9 plus one extreme: median 5.5, MAD 2.5, threshold 11.1195 —
    // exactly the extreme row is flagged
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong, i.toLong, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.madOutliers(ev).collect()(0)
    assert(r.getAs[Double]("med") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("n_total") === 10L)
  }

  test("seasonalAnomalies: diurnal swing is normal after deseasonalizing; the off-baseline spike is flagged") {
    val h = 3600L * 1000 * 1000 * 1000
    // hour 0 runs at value 10, hour 12 at value 100 (a strong diurnal
    // cycle a GLOBAL screen would misread); one hour-0 event at 90 is
    // the true anomaly
    val rows = (0 until 20).map(i => (i.toLong, 1L, i * 24 * h, "a", 10.0, "{}")) ++
      (0 until 20).map(i => (100L + i, 1L, i * 24 * h + 12 * h, "a", 100.0, "{}")) :+
      (999L, 1L, 20L * 24 * h, "a", 90.0, "{}")
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.seasonalAnomalies(ev).collect()(0)
    // baselines: hour 0 → (20·10 + 90)/21, hour 12 → 100; every
    // in-cycle row has residual ≈ const, MAD 0 → only the spike's
    // residual exceeds the threshold
    assert(r.getAs[Long]("n_total") === 41L)
    assert(r.getAs[Long]("n_anomalies") === 1L,
      s"expected exactly the planted spike, got ${r.getAs[Long]("n_anomalies")}")
    // the same stream through the UNseasonal screen flags the entire
    // noon half (or none) — never exactly the planted row
    val g = RelationalOps.madOutliers(ev).collect()(0)
    assert(g.getAs[Long]("n_outliers") !== 1L)
  }

  test("basketLift: coupled types lift above 1, anti-coupled below; singleton baskets contribute no pairs") {
    val day = 86400L * 1000 * 1000 * 1000
    // users 1-10: {buy, pay} together daily (perfectly coupled);
    // users 11-20: {view} alone on even days, {search} alone on odd
    // (never co-occur); user 30: singleton baskets only
    val rows =
      (1 to 10).flatMap(u => (0 until 3).flatMap(d => Seq(
        ((u * 100 + d * 2).toLong, u.toLong, d * day + 1, "buy", 1.0, "{}"),
        ((u * 100 + d * 2 + 1).toLong, u.toLong, d * day + 2, "pay", 1.0, "{}")))) ++
      (11 to 20).flatMap(u => (0 until 4).map(d => (
        (u * 100 + d).toLong, u.toLong, d * day + 1,
        if (d % 2 == 0) "view" else "search", 1.0, "{}"))) :+
      ((9999L, 30L, 1L, "buy", 1.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.basketLift(ev, minSupport = 2).collect()
      .map(x => (x.getAs[String]("a"), x.getAs[String]("b")) ->
        ((x.getAs[Long]("n_ab"), x.getAs[Double]("lift"),
          x.getAs[Double]("conf_a_to_b")))).toMap
    val bp = r(("buy", "pay"))
    assert(bp._1 === 30L)
    assert(bp._2 > 1.5, s"coupled pair must lift above independence: $bp")
    // buy⇒pay confidence: pay follows buy in 30 of buy's 31 baskets
    assert(math.abs(bp._3 - 30.0 / 31) < 1e-5)
    assert(!r.contains(("search", "view")), "never-co-occurring pair has zero support")
    assert(r.keySet === Set(("buy", "pay")))
  }

  test("eventsForecastBacktest: a stable diurnal cycle backtests to zero error; a shifted one shows the bias") {
    val day = 86400L * 1000 * 1000 * 1000
    val h = 3600L * 1000 * 1000 * 1000
    // type 'a': value = f(hour) constant across all 20 days → the
    // train-half baseline predicts the test half perfectly
    val stable = (0 until 20).flatMap(d => Seq(0, 12).map(hr =>
      ((d * 100 + hr).toLong, 1L, d * day + hr * h, "a", if (hr == 0) 5.0 else 50.0, "{}")))
    // type 'b': test half runs +10 above the train half → mae = bias = 10
    val shifted = (0 until 20).map(d =>
      ((2000 + d).toLong, 1L, d * day + 3 * h, "b", if (d < 10) 7.0 else 17.0, "{}"))
    val ev = (stable ++ shifted)
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsForecastBacktest(ev).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("split_day"), x.getAs[Long]("n_train"), x.getAs[Long]("n_test"),
          x.getAs[Double]("mae"), x.getAs[Double]("bias")))).toMap
    assert(r("a") === ((10L, 20L, 20L, 0.0, 0.0)))
    assert(r("b") === ((10L, 10L, 10L, 10.0, 10.0)))
  }

  test("eventsTrend: recovers the slope of a planted linear drift exactly") {
    val day = 86400L * 1000 * 1000 * 1000
    // daily mean = 5 + 2·day, exactly
    val rows = (0 until 30).flatMap(d =>
      (0 until 2).map(i => ((d * 2 + i).toLong, 1L, d * day + i, "a", 5.0 + 2.0 * d, "{}")))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsTrend(ev).collect()(0)
    assert(r.getAs[Long]("n_days") === 30L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 5.0)
  }

  test("activityGini: uniform activity scores 0; extreme concentration nears 1") {
    def ev(counts: Seq[Long]) = counts.zipWithIndex.flatMap { case (c, u) =>
      (1L to c).map(i => (u * 10000 + i, u.toLong, i, "a", 0.0, "{}"))
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    // 20 users × 5 events each: perfect equality
    val eq = RelationalOps.activityGini(ev(Seq.fill(20)(5L))).collect()(0)
    assert(eq.getAs[Double]("gini") === 0.0)
    assert(eq.getAs[Long]("top10_users") === 2L)
    assert(eq.getAs[Double]("top10_share") === 0.1) // 2 of 20 users = 10% of volume
    // 19 users with 1 event, 1 user with 981: near-total concentration
    val sk = RelationalOps.activityGini(ev(Seq.fill(19)(1L) :+ 981L)).collect()(0)
    assert(sk.getAs[Double]("gini") > 0.9, s"skewed gini: $sk")
    // top decile (2 users) = the whale + one single-event user
    assert(sk.getAs[Double]("top10_share") === 0.982)
  }

  test("deletePropagation: rebuild equals full minus the cohort, exactly") {
    import graft.functions.PortableHash.hash24Jvm
    val rows = (1L to 400L).map(u => (u, u, u, s"t${u % 3}", u * 0.01, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val forgotten = (1L to 400L).count(u => hash24Jvm(s"gdpr:$u") % 20 == 0)
    assert(forgotten > 0, "fixture must actually delete someone")
    val r = RelationalOps.deletePropagation(ev).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Boolean]("n_ok"), s"count residue: $x")
      assert(x.getAs[Boolean]("cents_ok"), s"cents residue: $x")
      assert(x.getAs[Long]("n_full") ===
        x.getAs[Long]("n_rebuilt") + x.getAs[Long]("n_del"))
    }
    assert(r.map(_.getAs[Long]("n_del")).sum === forgotten.toLong)
  }

  test("deletePropagation: a fully-erased type still appears with n_rebuilt=0 and ok flags true") {
    import graft.functions.PortableHash.hash24Jvm
    val victim = (1L to 100000L).find(u => hash24Jvm(s"gdpr:$u") % 20 == 0).get
    val keeper = (1L to 100000L).find(u => hash24Jvm(s"gdpr:$u") % 20 != 0).get
    // type 'gone' has ONLY cohort rows; an inner rebuilt join would drop it
    val rows = Seq((1L, victim, 1L, "gone", 2.5, "{}"),
      (2L, victim, 2L, "gone", 1.5, "{}"), (3L, keeper, 3L, "kept", 1.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.deletePropagation(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r.contains("gone"), "fully-erased type must stay in the audit")
    assert(r("gone").getAs[Long]("n_rebuilt") === 0L)
    assert(r("gone").getAs[Long]("n_del") === 2L)
    assert(r("gone").getAs[Boolean]("n_ok") && r("gone").getAs[Boolean]("cents_ok"))
    assert(r("kept").getAs[Long]("n_del") === 0L)
  }

  test("valueDrift: a planted location shift trips KS; a stable type does not") {
    val day = 86400L * 1000 * 1000 * 1000
    // type s: early values in [0,1), late values in [10,11) — KS ~ 1
    // type ok: same uniform grid in both halves — KS ~ 0
    val rows = (0 until 200).flatMap { i =>
      val (d, base) = if (i < 100) (i % 10, 0.0) else (10 + i % 10, 10.0)
      Seq(((i * 2).toLong, 1L, d * day, "s", base + (i % 10) / 10.0, "{}"),
        ((i * 2 + 1).toLong, 1L, d * day, "ok", (i % 10) / 10.0, "{}"))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.valueDrift(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("s").getAs[Boolean]("drifted"), s"shifted type must drift: ${r("s")}")
    assert(r("s").getAs[Double]("ks_stat") > 0.9)
    assert(!r("ok").getAs[Boolean]("drifted"), s"stable type must not: ${r("ok")}")
    assert(r.values.forall(_.getAs[Boolean]("comparable")))
  }

  test("valueDrift: degenerate inputs get defined answers, not nulls or crashes") {
    val day = 86400L * 1000 * 1000 * 1000
    // type c: constant value (vmax == vmin for its rows) in both halves;
    // type one: every row in the early half — no two-sample question
    val rows = (0 until 40).map { i =>
      val d = if (i % 2 == 0) 0L else 19L
      (i.toLong, 1L, d * day, "c", 5.0, "{}")
    } ++ (0 until 10).map(i => ((100 + i).toLong, 1L, 0L, "one", 5.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.valueDrift(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    // constant column: everything bins to 0, KS = 0, no drift, no NaN
    assert(r("c").getAs[Boolean]("comparable"))
    assert(r("c").getAs[Double]("ks_stat") === 0.0)
    assert(!r("c").getAs[Boolean]("drifted"))
    // one-half type: flagged not-comparable, verdict null, counts defined
    assert(!r("one").getAs[Boolean]("comparable"))
    assert(r("one").getAs[Long]("n_late") === 0L)
    assert(r("one").isNullAt(r("one").fieldIndex("drifted")))
  }

  test("mixDrift: a type tripling its share dominates the chi-square") {
    val day = 86400L * 1000 * 1000 * 1000
    // early: 100 a / 100 b; late: 100 a / 300 b
    val rows = (0 until 200).map(i =>
      (i.toLong, 1L, (i % 10) * day, if (i < 100) "a" else "b", 0.0, "{}")) ++
      (0 until 400).map(i =>
        ((1000 + i).toLong, 1L, (20 + i % 10) * day,
          if (i < 100) "a" else "b", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.mixDrift(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("a").getAs[Long]("df") === 1L)
    assert(r("b").getAs[Boolean]("drifted"), s"mix change must drift: $r")
    assert(r("b").getAs[Double]("contrib") > 0.0)
    assert(r("a").getAs[Double]("chi2") === r("b").getAs[Double]("chi2"))
  }

  test("activeTime: overlapping holds fuse, a gap opens a new island") {
    val min = 60L * 1000 * 1000 * 1000
    // user 1: events at 0 and 5min (holds overlap → one island of
    // 15 min), then at 60min (new island, 10 min) → 25 active minutes
    val rows = Seq(
      (1L, 1L, 0L, "a", 0.0, "{}"),
      (2L, 1L, 5 * min, "a", 0.0, "{}"),
      (3L, 1L, 60 * min, "a", 0.0, "{}"),
      // user 2: one event → one 10-min island
      (4L, 2L, 0L, "a", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.activeTime(ev).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("n_islands"), x.getAs[Long]("active_min")))).toMap
    assert(r(1L) === ((2L, 25L)))
    assert(r(2L) === ((1L, 10L)))
  }

  test("funnelLatency: first view to first subsequent purchase, pre-view purchases ignored") {
    val min = 60L * 1000 * 1000 * 1000
    val rows = Seq(
      // user 1: view at t0, purchases at +30min and +10min → first is +10
      (1L, 1L, 0L, "view", 0.0, "{}"),
      (2L, 1L, 30 * min, "purchase", 0.0, "{}"),
      (3L, 1L, 10 * min, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE any view → not a conversion
      (4L, 2L, 0L, "purchase", 0.0, "{}"),
      (5L, 2L, 5 * min, "view", 0.0, "{}"),
      // user 3: view only → not converted
      (6L, 3L, 0L, "view", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.funnelLatency(ev).collect()(0)
    assert(r.getAs[Long]("n_converted") === 1L)
    assert(r.getAs[Long]("max_min") === 10L)
    assert(r.getAs[Double]("p50_min") === 10.0)
  }

  test("scd2Lookup: each purchase sees exactly the version valid at its timestamp") {
    // user 1: click t1 → purchase t2 (opens v2) → purchase t3 (same
    // state, no new version) → signup t4
    val us = 1000L // ns per µs
    val rows = Seq(
      (1L, 1L, 1000L * us, "click", 0.0, "{}"),
      (2L, 1L, 2000L * us, "purchase", 0.0, "{}"),
      (3L, 1L, 3000L * us, "purchase", 0.0, "{}"),
      (4L, 1L, 4000L * us, "signup", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.scd2Lookup(ev).collect()
      .map(x => x.getAs[Long]("event_id") ->
        ((x.getAs[Long]("version"), x.getAs[String]("state")))).toMap
    assert(r.keySet === Set(2L, 3L)) // one row per purchase, no duplicates
    assert(r(2L) === ((2L, "purchase"))) // self-opened version, from-inclusive
    assert(r(3L) === ((2L, "purchase"))) // mid-interval lookup
  }

  test("watermarkProfile: a late arrival is measured against the prior-bucket high water") {
    // ids 0..7 arrive in order, ts = (id+1) seconds — except id 6,
    // which carries a 0.5 s timestamp (arrives 5.5 s late vs the
    // high-water mark of buckets 0..2, which is id 5's 6 s)
    val sec = 1000L * 1000 * 1000
    val rows = (0L to 7L).map { id =>
      val ts = if (id == 6L) sec / 2 else (id + 1) * sec
      (id, 1L, ts, if (id == 6L) "late" else "ok", 0.0, "{}")
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    // targetBuckets=4 over ids 0..7 → width ceil(8/4)=2: buckets
    // {0,1},{2,3},{4,5},{6,7} — id 6's prior high water is id 5's 6 s
    val r = RelationalOps.watermarkProfile(ev, targetBuckets = 4L).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("late").getAs[Long]("n_late") === 1L)
    assert(r("late").getAs[Long]("max_ms") === 5500L)
    assert(r("ok").getAs[Long]("n_late") === 0L) // in-order stream is never late
    assert(r("ok").getAs[Double]("p95_ms") === 0.0)
  }

  test("watermarkProfile: bucket count stays bounded however large the id space grows") {
    // ids span 0..10^6 — a fixed width would put ~16k rows under the
    // unpartitioned running-max window; the derived width keeps it ≤4096
    val sec = 1000L * 1000 * 1000
    val rows = (0 until 500).map { i =>
      val id = i.toLong * 2000L // sparse ids up to 10^6
      (id, 1L, (i + 1) * sec, "ok", 0.0, "{}")
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.watermarkProfile(ev).collect()
    assert(r.length === 1 && r(0).getAs[Long]("n_late") === 0L)
  }

  test("dpSensitivityAudit: max per-user contribution inflates epsilon exactly") {
    // user 1 hits "click" twice -> user-level sensitivity 2; "view" 1
    val rows = Seq((1L, 1L, 1L, "click", 1.0, "{}"), (2L, 1L, 2L, "click", 1.0, "{}"),
      (3L, 2L, 3L, "click", 1.0, "{}"), (4L, 1L, 4L, "view", 1.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.dpSensitivityAudit(ev).collect()
    assert(r.length === 6) // 2 types x 3 epsilons
    val click = r.filter(_.getAs[String]("event_type") == "click")
      .map(x => x.getAs[Long]("eps6") -> x.getAs[Long]("eps_effective6")).toMap
    assert(click === Map(500000L -> 1000000L, 1000000L -> 2000000L,
      2000000L -> 4000000L), "eps_eff = eps * max_user_rows(2)")
    r.filter(_.getAs[String]("event_type") == "view").foreach { x =>
      assert(x.getAs[Long]("max_user_rows") === 1L)
      assert(x.getAs[Long]("eps_effective6") === x.getAs[Long]("eps6"))
    }
  }

  test("dpCounts: deterministic Laplace noise, zero-centered scale shrinks with epsilon") {
    val rows = (1L to 300L).map(i => (i, i % 7, i, s"t${i % 5}", 1.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.dpCounts(ev).collect()
    assert(r.length === 15) // 5 types × 3 epsilons
    // determinism: a second run produces the identical noise values
    val r2 = RelationalOps.dpCounts(ev).collect()
    assert(r.map(_.toSeq).toSet === r2.map(_.toSeq).toSet)
    // n_noisy = n_true + noise exactly, at every epsilon
    r.foreach { x =>
      assert(math.abs(x.getAs[Double]("n_noisy") -
        (x.getAs[Long]("n_true") + x.getAs[Double]("noise"))) < 1e-9)
    }
    // privacy/utility trade: mean |noise| at eps 0.5 exceeds eps 2.0
    // (expected |Laplace(1/eps)| = 1/eps — a 4x gap over 5 draws)
    def meanAbs(eps: Double) = r.filter(_.getAs[Double]("epsilon") == eps)
      .map(x => math.abs(x.getAs[Double]("noise"))).sum / 5
    assert(meanAbs(0.5) > meanAbs(2.0),
      s"eps 0.5 noise ${meanAbs(0.5)} should exceed eps 2.0 noise ${meanAbs(2.0)}")
  }

  test("eventTransitions: per-user consecutive pairs with row-normalized probabilities") {
    // user 1: a→b→a→c; user 2: b→a. Transitions: (a,b) 1, (b,a) 2, (a,c) 1
    val rows = Seq(
      (1L, 1L, 100L, "a", 0.0, "{}"), (2L, 1L, 200L, "b", 0.0, "{}"),
      (3L, 1L, 300L, "a", 0.0, "{}"), (4L, 1L, 400L, "c", 0.0, "{}"),
      (5L, 2L, 100L, "b", 0.0, "{}"), (6L, 2L, 200L, "a", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventTransitions(ev).collect()
      .map(x => (x.getAs[String]("from_type"), x.getAs[String]("to_type")) ->
        ((x.getAs[Long]("n_trans"), x.getAs[Double]("p_trans")))).toMap
    assert(r.keySet === Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(r(("a", "b")) === ((1L, 0.5)))
    assert(r(("a", "c")) === ((1L, 0.5)))
    assert(r(("b", "a")) === ((2L, 1.0)))
    // no cross-user pair: user 1's trailing c never transitions to user 2's b
  }

  test("eventsTrend: a single-day type is dropped, not a NaN row") {
    val day = 86400L * 1000 * 1000 * 1000
    // type "a" spans 3 days (fit is defined); type "b" has one day only —
    // its OLS denominator n·sxx − sx² is 0, so the row must be absent
    val rows = (0 until 3).map(d => (d.toLong, 1L, d * day, "a", 1.0 + d, "{}")) :+
      ((99L, 1L, 5 * day, "b", 7.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsTrend(ev).collect()
    assert(r.map(_.getAs[String]("event_type")).toSet === Set("a"))
    assert(!r.exists(x => x.getAs[Double]("slope").isNaN))
  }

  test("ivmReceipt: base+delta integer state merges to the full aggregate exactly") {
    val li = (1L to 50L).map(k => (k, k, k, 1L, 1.0, 10.01 * k, 0.0, 0.0,
        if (k % 3 == 0) "A" else "N", "O", "1996-01-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val r = RelationalOps.ivmReceipt(li).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("maintained_ok")),
      "integer-state merge must be an identity")
    r.foreach { x =>
      assert(x.getAs[Long]("full_n") === x.getAs[Long]("merged_n"))
      assert(x.getAs[Long]("full_cents") === x.getAs[Long]("merged_cents"))
    }
  }

  test("eventsChangepoint: CUSUM extremum lands on the planted level shift") {
    val day = 86400L * 1000 * 1000 * 1000
    // 20 days at level 10, then 20 days at level 50: |CUSUM| peaks at
    // the last pre-shift day (day 19)
    val rows = (0 until 40).flatMap { d =>
      val level = if (d < 20) 10.0 else 50.0
      (0 until 3).map(i => ((d * 10 + i).toLong, 1L, d * day + i, "a", level, "{}"))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsChangepoint(ev).collect()(0)
    assert(r.getAs[Long]("n_days") === 40L)
    assert(r.getAs[Long]("cp_day") === 19L, s"got day ${r.getAs[Long]("cp_day")}")
    // |CUSUM| at the split = 20·|10 − 30| = 400
    assert(r.getAs[Double]("max_abs_cusum") === 400.0)
  }

  test("tableProfile: nulls, distincts, and bounds per column from one scan") {
    val df = Seq(
      (Some(1.0), 10.0), (Some(2.0), 10.0), (None, 30.0), (Some(2.0), -5.5)
    ).toDF("a", "b")
    val r = RelationalOps.tableProfile(df, Seq("a", "b")).collect()
      .map(x => x.getAs[String]("column") ->
        ((x.getAs[Long]("n_rows"), x.getAs[Long]("n_null"), x.getAs[Long]("n_distinct"),
          x.getAs[Double]("min_v"), x.getAs[Double]("max_v")))).toMap
    assert(r("a") === ((4L, 1L, 2L, 1.0, 2.0)))
    assert(r("b") === ((4L, 0L, 3L, -5.5, 30.0)))
  }

  test("dqChecks: planted FK orphan, duplicate key, and negative quantity are each caught") {
    val customer = Seq((1L, "x", 0L, 0.0, "m"), (2L, "y", 0L, 0.0, "m"), (2L, "y2", 0L, 0.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((10L, 1L, "O", 5.0, "1996-01-01", "1-URGENT"),
        (11L, 99L, "O", 6.0, null, "1-URGENT")) // orphan custkey + null date
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = Seq((10L, 1L, 1L, 1L, -3.0, 1.0, 0.05, 0.01, "N", "O", "1996-01-02"),
        (77L, 1L, 1L, 1L, 4.0, 1.0, 1.75, 0.01, "N", "O", "1996-01-02")) // orphan + bad disc
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val r = RelationalOps.dqChecks(customer, orders, lineitem).collect()
      .map(x => x.getAs[String]("check") ->
        ((x.getAs[Long]("n_checked"), x.getAs[Long]("n_violations"),
          x.getAs[Boolean]("pass")))).toMap
    assert(r("fk_orders_customer") === ((2L, 1L, false)))
    assert(r("fk_lineitem_orders") === ((2L, 1L, false)))
    assert(r("unique_customer_key") === ((3L, 1L, false)))
    assert(r("range_l_discount") === ((2L, 1L, false)))
    assert(r("positive_l_quantity") === ((2L, 1L, false)))
    assert(r("nonnull_o_orderdate") === ((2L, 1L, false)))
  }

  test("eventsBurstiness: metronome at -1, bursty positive, square-sum exact at 10^26 scale") {
    val h = 3600L * 1000 * 1000 * 1000
    // u1 metronome: identical gaps → cv 0 → B = -1
    // u2 bursty: 5 events packed in seconds, then 3 hours, repeat
    val rows =
      (0 until 8).map(i => (100L + i, i * h, 1L)) ++
        (0 until 10).map { i =>
          val burst = i / 5; val in = i % 5
          (200L + i, burst * 3 * h + in * 1000000L, 2L)
        }
    val ev = rows.map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.eventsBurstiness(ev, minEvents = 5).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Double]("cv"), x.getAs[Double]("burstiness")))).toMap
    assert(r(1L)._1 === 0.0 && r(1L)._2 === -1.0)
    assert(r(2L)._2 > 0.4, s"bursty user should score high, got ${r(2L)}")
    // gap² for a 3-hour gap is ~1.2e26 — past Long range; the decimal
    // accumulator must survive it (any overflow would corrupt cv)
    assert(r(2L)._1 > 1.0)
  }

  test("cohortRetention: first-active-day cohorts with per-offset rates") {
    val day = 86400L * 1000 * 1000 * 1000
    // u1: days 0,1,2; u2: day 0 only; u3: days 1,2 (cohort day 1);
    // duplicate same-day events must not double-count
    val ev = Seq(
      (0L, 0L * day + 5, 1L), (1L, 0L * day + 9, 1L), // dup day for u1
      (2L, 1L * day + 1, 1L), (3L, 2L * day + 1, 1L),
      (4L, 0L * day + 2, 2L),
      (5L, 1L * day + 3, 3L), (6L, 2L * day + 7, 3L)
    ).map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.cohortRetention(ev).collect()
      .map(x => (x.getAs[Long]("cohort_day"), x.getAs[Long]("day_offset")) ->
        (x.getAs[Long]("n_active"), x.getAs[Long]("cohort_size"),
          x.getAs[Double]("retention"))).toMap
    assert(r((0L, 0L)) === ((2L, 2L, 1.0))) // u1, u2
    assert(r((0L, 1L)) === ((1L, 2L, 0.5))) // u1 returned
    assert(r((0L, 2L)) === ((1L, 2L, 0.5)))
    assert(r((1L, 0L)) === ((1L, 1L, 1.0))) // u3's own cohort
    assert(r((1L, 1L)) === ((1L, 1L, 1.0)))
    assert(r.size === 5)
  }

  test("eventsSeasonality: day-cycle folding and deterministic peak rank") {
    val h = 3600L * 1000 * 1000 * 1000
    // hour 25 folds onto hour-of-day 1 (next day, same cycle slot)
    val events = Seq(
      (1L, 10L, h, "a", 2.0, "{}"), (2L, 10L, h + 7L, "a", 4.0, "{}"),
      (3L, 11L, 25 * h, "a", 6.0, "{}"), (4L, 12L, 3 * h, "a", 10.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsSeasonality(events).collect()
      .map(x => x.getLong(1) -> ((x.getLong(2), x.getDouble(3), x.getLong(4)))).toMap
    assert(r(1L) === ((3L, 4.0, 1L)), "hod 1 aggregates both days, peak rank 1")
    assert(r(3L) === ((1L, 10.0, 2L)))
  }

  test("kAnonymity: singleton profile lands in band 1, twins in 2-4; tie-break deterministic") {
    val d = 86400L * 1000 * 1000 * 1000
    // users 10/20: identical quasi-profile (2 events, 1 day, top 'a')
    // → one class of k=2; user 30: 12 events over 4 days, top type
    // tie between 'a' and 'b' (6 each) broken to 'a', singleton class
    val rows =
      Seq((10L, 0L, "a"), (10L, 1L, "a"), (20L, 0L, "a"), (20L, 1L, "a")) ++
        (0 until 6).map(i => (30L, i * d, "b")) ++
        (0 until 6).map(i => (30L, i * d + 1, "a"))
    val events = rows.zipWithIndex
      .map { case ((u, ts, t), i) => (i.toLong, u, ts, t, 1.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.kAnonymity(events).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // u30: 12 events → bucket 1, 6 days → bucket 2, top 'a' (tie);
    // u10/u20: 2 events → bucket 0, 1 day → bucket 0, top 'a'
    assert(r("1") === ((1L, 1L)))
    assert(r("2-4") === ((1L, 2L)))
    assert(r.size === 2)
  }

  test("eventsAutocorr: alternating series gives r1 near -1, calendar gaps break pairs") {
    val d = 86400L * 1000 * 1000 * 1000
    // type 'alt': perfectly alternating daily means over days 0..9
    // -> lag-1 autocorr -1 (up to the n-pair edge effect), lag-2 +1-ish
    val alt = (0 until 10).map(day => (day * d, if (day % 2 == 0) 10.0 else 20.0, "alt"))
    // type 'gap': days 0,1,5,6 - lag-1 pairs only (0,1) and (5,6)
    val gap = Seq(0, 1, 5, 6).map(day => (day * d, day * 1.0, "gap"))
    val events = (alt ++ gap).zipWithIndex.map { case ((ts, v, t), i) =>
      (i.toLong, 1L, ts, t, v, "{}")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsAutocorr(events).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("lag")) ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Double]("autocorr")))).toMap
    assert(r(("alt", 1L))._2 < -0.8)
    assert(r(("alt", 2L))._2 > 0.7)
    assert(r(("gap", 1L))._1 === 2L, "gap days must not pair across the hole")
    assert(!r.contains(("gap", 3L)) || r(("gap", 3L))._1 <= 1L)
  }

  test("forecastInterval: calibrated interval covers the held-out third, outliers excluded") {
    val d = 86400L * 1000 * 1000 * 1000
    val h = 3600L * 1000 * 1000 * 1000
    // 9-day calendar -> days 0-2 train, 3-5 calibrate, 6-8 evaluate.
    // hour-0 values: train flat 10.0; calibration residuals in
    // [-1, 1]; eval has two in-band values and one wild outlier
    val rows =
      (0 until 3).map(day => (day * d, 10.0)) ++         // train
        Seq((3 * d, 9.5), (4 * d, 10.5), (5 * d, 10.0),  // cal: resid -0.5, 0.5, 0
          (5 * d + 1, 9.0), (5 * d + 2, 11.0)) ++        // cal tails: -1, 1
        Seq((6 * d, 10.2), (7 * d, 9.8), (8 * d, 99.0))  // eval: 2 in, 1 out
    val events = rows.zipWithIndex.map { case ((ts, v), i) =>
      (i.toLong, 1L, ts, "m", v, "{}")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.forecastInterval(events).head()
    assert(r.getAs[Long]("n_eval") === 3L)
    assert(r.getAs[Long]("n_covered") === 2L, "the outlier must fall outside")
    assert(r.getAs[Double]("coverage") === 0.666667)
    assert(r.getAs[Double]("q05") < 0.0 && r.getAs[Double]("q95") > 0.0)
  }

  test("rfmSegments: value quintiles share scores on ties, segments partition users") {
    val d = 86400L * 1000 * 1000 * 1000
    // 10 users; user u purchases (u+1) times of value 10.0 on day u
    // (horizon day 9) — every metric strictly increases with u
    val rows = (0 until 10).flatMap { u =>
      (0 to u).map(k => (u.toLong * 100 + k, u.toLong, u * d + k, "purchase", 10.0, "{}"))
    }
    val events = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val segs = RelationalOps.rfmSegments(events).collect()
      .map(x => x.getAs[String]("segment") -> x.getAs[Long]("n_users")).toMap
    assert(segs.values.sum === 10L, "segments partition the user base")
    // user 9: most recent, most frequent, highest spend -> champion;
    // user 0: oldest, least frequent -> hibernating
    assert(segs.getOrElse("champion", 0L) >= 1L)
    assert(segs.getOrElse("hibernating", 0L) >= 1L)
    // determinism across runs
    val again = RelationalOps.rfmSegments(events).collect()
      .map(x => x.getAs[String]("segment") -> x.getAs[Long]("n_users")).toMap
    assert(again === segs)
  }

  test("markovAccuracy: held-out grading, unseen from-type scores 0 with null prediction") {
    val d = 86400L * 1000 * 1000 * 1000
    // 10-day calendar -> pairs with from-day < 5 train, >= 5 test.
    // user 1 (train days 0-3): a->b three times, a->c once => predict b.
    // user 2 (test days 6-9): a->b, a->b, a->c => accuracy 2/3.
    // user 3 (test days 6-7): x->y, never seen in train.
    val rows =
      Seq((1L, 0L, "a"), (1L, 0L, "b"), (1L, 1L, "a"), (1L, 1L, "b"),
        (1L, 2L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 3L, "c")) ++
        Seq((2L, 6L, "a"), (2L, 6L, "b"), (2L, 7L, "a"), (2L, 7L, "b"),
          (2L, 8L, "a"), (2L, 8L, "c"), (2L, 9L, "z")) ++
        Seq((3L, 6L, "x"), (3L, 7L, "y"))
    val events = rows.zipWithIndex.map { case ((u, day, t), i) =>
      (i.toLong, u, day * d + i, t, 1.0, "{}")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.markovAccuracy(events).collect()
      .map(x => x.getAs[String]("from_type") ->
        ((Option(x.getAs[String]("predicted_next")), x.getAs[Long]("n_test"),
          x.getAs[Long]("n_correct"), x.getAs[Double]("accuracy")))).toMap
    assert(r("a") === ((Some("b"), 3L, 2L, 0.666667)))
    assert(r("x") === ((None, 1L, 0L, 0.0)), "unseen from-type: null prediction, 0 accuracy")
    // the z event and user-2's c->z pair land where expected: c seen
    // in train (from a->c's c? no - c only as a TO type), so c->z is
    // also an unseen from
    assert(r.get("c").forall(_._1.isEmpty))
  }

  test("prePurchasePaths: exact predecessor triple, early purchases excluded") {
    // user 1: view > click > view > purchase (path view>click>view);
    // user 2: purchase with only 2 predecessors -> excluded;
    // user 3: same path as user 1
    def stream(u: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (u * 100 + i, u, i.toLong * 1000, t, 1.0, "{}")
    }
    val rows = stream(1L, Seq("view", "click", "view", "purchase")) ++
      stream(2L, Seq("view", "click", "purchase")) ++
      stream(3L, Seq("view", "click", "view", "purchase"))
    val events = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.prePurchasePaths(events).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("path") === "view>click>view")
    assert(r.head.getAs[Long]("n") === 2L)
    assert(r.head.getAs[Double]("share") === 1.0)
  }

  test("survivalCurve: textbook KM on a planted cohort, censoring respected") {
    val d = 86400L * 1000 * 1000 * 1000
    // 10 users all starting day 0: 4 churn with span 2 (last day 1),
    // 3 churn with span 5, 3 survive to the horizon day 9 (span 10,
    // censored). KM: S(2) = 1 - 4/10 = 0.6; S(5) = 0.6 * (1 - 3/6)
    // = 0.3; S(10): d=0 at the censored duration -> stays 0.3.
    val rows =
      (0 until 4).flatMap(u => Seq((u.toLong, 0L), (u.toLong, d))) ++
        (4 until 7).flatMap(u => Seq((u.toLong, 0L), (u.toLong, 4 * d))) ++
        (7 until 10).flatMap(u => Seq((u.toLong, 0L), (u.toLong, 9 * d)))
    val events = rows.zipWithIndex
      .map { case ((u, ts), i) => (i.toLong, u, ts, "view", 1.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.survivalCurve(events).collect()
      .map(x => x.getAs[Long]("duration") ->
        ((x.getAs[Long]("n_risk"), x.getAs[Long]("n_churned"),
          x.getAs[Long]("n_censored"), x.getAs[Double]("survival")))).toMap
    assert(r(2L) === ((10L, 4L, 0L, 0.6)))
    assert(r(5L)._1 === 6L && r(5L)._2 === 3L)
    assert(math.abs(r(5L)._4 - 0.3) < 2e-6)
    assert(r(10L) === ((3L, 0L, 3L, r(5L)._4)), "censored tail keeps S flat")
  }

  test("abTest: exact counts, a planted lift is significant, degenerate pools guard to z=0") {
    // 40 even users: 30 convert (3 purchases); 40 odd users: 6 convert
    def ev(u: Long, purchases: Int) =
      (0 until purchases).map(i => (u * 100 + i, u, i.toLong, "purchase", 1.0, "{}")) :+
        ((u * 100 + 99, u, 99L, "view", 1.0, "{}"))
    val rows = (0 until 80).flatMap { i =>
      val u = i.toLong
      val converts = if (u % 2 == 0) (u / 2) % 4 != 0 else (u / 2) % 7 == 0
      ev(u, if (converts) 3 else 1)
    }
    val events = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.abTest(events, minPurchases = 3).head()
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("n_b") === 40L)
    assert(r.getAs[Long]("conv_a") === 30L && r.getAs[Long]("conv_b") === 6L)
    assert(r.getAs[Boolean]("significant"), "a 75% vs 15% lift must be significant")
    assert(r.getAs[Double]("z") > 1.96)
    // degenerate: everyone converts → zero pooled variance → the
    // explicit z=0 guard, not an ANSI divide-by-zero
    val all = (0 until 10).flatMap(i => ev(i.toLong, 3))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val d = RelationalOps.abTest(all, minPurchases = 3).head()
    assert(d.getAs[Double]("z") === 0.0 && !d.getAs[Boolean]("significant"))
  }

  test("ivmJoinReceipt: four delta legs reassemble the full join exactly") {
    val ord = Seq((1L, "F"), (2L, "O"), (3L, "F"), (4L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    // every (orderkey, linenumber parity) combination populated so
    // all four legs contribute
    val li = (1L to 4L).flatMap(k => Seq((k, 1L, 10.0), (k, 2L, 20.0)))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    val r = RelationalOps.ivmJoinReceipt(ord, li).collect()
    assert(r.length === 2)
    r.foreach { x =>
      assert(x.getAs[Boolean]("maintained_ok"))
      assert(x.getAs[Long]("full_n") === 4L) // 2 orders × 2 lineitems
      assert(x.getAs[Long]("full_cents") === 2 * (1000L + 2000L))
      assert(x.getAs[Long]("merged_n") === x.getAs[Long]("full_n"))
      assert(x.getAs[Long]("merged_cents") === x.getAs[Long]("full_cents"))
    }
  }

  test("dataQualityChecks: planted violations are counted exactly, clean checks pass") {
    import java.sql.Date
    val li = Seq(
      (1L, 5.0, 0.05, Date.valueOf("2024-02-01")),  // clean
      (1L, 99.0, 0.05, Date.valueOf("2024-02-01")), // quantity out of range
      (7L, 5.0, 0.30, Date.valueOf("2024-02-01")),  // fk orphan + discount
      (2L, 5.0, 0.05, Date.valueOf("2023-12-31")))  // ships before its order
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_shipdate")
    val ord = Seq(
      (1L, 10L, "F", Date.valueOf("2024-01-01")),
      (1L, 10L, "F", Date.valueOf("2024-01-01")),   // pk duplicate
      (2L, 99L, "X", Date.valueOf("2024-01-01")))   // fk orphan + bad status
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    val cust = Seq((10L, Some(5.0)), (11L, None))
      .toDF("c_custkey", "c_acctbal")
    val r = RelationalOps.dataQualityChecks(li, ord, cust).collect()
      .map(x => x.getAs[String]("check_name") ->
        ((x.getAs[Long]("n_checked"), x.getAs[Long]("n_violations"), x.getAs[Boolean]("ok"))))
      .toMap
    assert(r("orders_pk_unique") === ((3L, 1L, false)))
    assert(r("lineitem_fk_orders") === ((4L, 1L, false)))
    assert(r("orders_fk_customer") === ((3L, 1L, false)))
    assert(r("lineitem_quantity_range") === ((4L, 1L, false)))
    assert(r("lineitem_discount_range") === ((4L, 1L, false)))
    assert(r("orders_status_domain") === ((3L, 1L, false)))
    assert(r("customer_acctbal_not_null") === ((2L, 1L, false)))
    // orderkey 1 is duplicated in orders, so its 2 lineitems match
    // twice each: 5 joined rows checked, only the early ship violates
    assert(r("lineitem_ship_after_order") === ((5L, 1L, false)))
    assert(r.size === 8)
  }

  test("attributionCompare: exact conservation, models credit different hours") {
    val h = 3600L * 1000 * 1000 * 1000 // one hour in nanos
    // user 1: views at hours 1, 2, 5 then purchase at hour 6 (3
    // touches); user 2: one view at hour 2, purchase at hour 3
    val rows = Seq(
      (10L, 1L, 1 * h, "view"), (11L, 1L, 2 * h, "view"), (12L, 1L, 5 * h, "view"),
      (13L, 1L, 6 * h, "purchase"),
      (20L, 2L, 2 * h, "view"), (21L, 2L, 3 * h, "purchase"))
    val events = rows.map { case (e, u, ts, t) => (e, u, ts, t, 1.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.attributionCompare(events).collect()
      .map(x => (x.getAs[String]("model"), x.getAs[Long]("view_hour")) ->
        ((x.getAs[Long]("n_touches"), x.getAs[Long]("credit_micro")))).toMap
    // conservation: each model's total credit = 1e6 per attributed purchase
    Seq("first_touch", "last_touch", "linear").foreach { m =>
      val tot = r.collect { case ((`m`, _), (_, c)) => c }.sum
      assert(tot === 2000000L, s"$m must conserve credit exactly")
    }
    assert(r(("first_touch", 1L))._2 === 1000000L)
    assert(r(("last_touch", 5L))._2 === 1000000L)
    // linear: u1 splits 333333/333333/333334 (remainder to LAST touch
    // = hour 5), u2's single view takes the full credit at hour 2
    assert(r(("linear", 1L))._2 === 333333L)
    assert(r(("linear", 2L))._2 === 333333L + 1000000L)
    assert(r(("linear", 5L))._2 === 333334L)
  }

  test("lDiversity: a same-sensitive class fails the gate, a diverse one passes") {
    // users 1/2/3 share the quasi-profile (2 events, 1 day) with
    // distinct top types (l=3, passes); users 5/6/7 in a second
    // profile (12 events → activity bucket 1, 1 day) all share top
    // 'x' (l=1, fails)
    val rows =
      Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (3L, "c"), (3L, "c")) ++
        Seq(5L, 6L, 7L).flatMap(u => (0 until 12).map(_ => (u, "x")))
    val events = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, (i % 2).toLong, t, 1.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.lDiversity(events).collect()
      .map(x => (x.getAs[Long]("activity_bucket"), x.getAs[Long]("days_bucket")) ->
        ((x.getAs[Long]("k"), x.getAs[Long]("l_distinct"), x.getAs[Boolean]("diverse_ok"))))
      .toMap
    assert(r((0L, 0L)) === ((3L, 3L, true)))  // 2-event users, 3 distinct tops
    assert(r((0L, 0L))._3)
    assert(r.size === 2)
    val uniform = r.values.find(_._2 === 1L).get
    assert(uniform === ((3L, 1L, false)), "all-same-sensitive class must fail")
  }

  test("tCloseness: representative class passes, skewed class fails, TVD exact") {
    // class (0,0): u1..u4, 2 events each, tops a,a,b,b (mix 1/2 vs
    // global 2/3 a) — num = |2*6-4*4| + |2*6-2*4| = 8, tvd_micro =
    // 8e6/(2*4*6) = 166666 → passes; class (1,0): u5,u6 with 12 'a'
    // events each (all-a mix vs 2/3 global) — 8e6/(2*2*6) = 333333 →
    // fails
    val rows =
      Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"),
        (3L, "b"), (3L, "b"), (4L, "b"), (4L, "b")) ++
        Seq(5L, 6L).flatMap(u => (0 until 12).map(_ => (u, "a")))
    val events = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, 0L, t, 1.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.tCloseness(events).collect()
      .map(x => (x.getAs[Long]("activity_bucket"), x.getAs[Long]("days_bucket")) ->
        ((x.getAs[Long]("k"), x.getAs[Long]("tvd_micro"), x.getAs[Boolean]("t_ok"))))
      .toMap
    assert(r((0L, 0L)) === ((4L, 166666L, true)))
    assert(r((1L, 0L)) === ((2L, 333333L, false)))
    assert(r.size === 2)
  }

  test("mannWhitney: complete separation is significant, all-tied variance guards to 0") {
    val day = 86400L * 1000 * 1000 * 1000
    // type 'up': early {1,2,3,4} strictly below late {11,12,13,14} →
    // U1 = 0, z = -16/(2*sqrt(12)) = -2.309401; type 'flat': all
    // values tied → tie-corrected variance 0 → z = 0
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        ((i % 2).toLong * day, "up", v) } ++
      Seq(11.0, 12.0, 13.0, 14.0).zipWithIndex.map { case (v, i) =>
        ((2 + i % 2).toLong * day, "up", v) } ++
      (0 until 8).map(i => ((i % 4).toLong * day, "flat", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.mannWhitney(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_early"), x.getAs[Long]("n_late"),
          x.getAs[Long]("u1_x2"), x.getAs[Double]("z"),
          x.getAs[Boolean]("significant"))))
      .toMap
    assert(r("up") === ((4L, 4L, 0L, -2.309401, true)))
    // flat: single census row, rank2 = N+1 → u1_x2 = n1*n2 = 16, z=0
    assert(r("flat") === ((4L, 4L, 16L, 0.0, false)))
  }

  test("theilSenTrend: exact medians, outlier resistance, floored negative slope") {
    val day = 86400L * 1000 * 1000 * 1000
    // 'lin': perfectly linear, every pairwise slope = 1e6 micros;
    // 'out': one exploding day — the median shrugs where OLS (~30.1)
    // is dragged; 'neg2': num=-1 over den=2 pins FLOOR division
    // (truncation toward zero would give 0, floor gives -1)
    val rows =
      Seq(0.0, 1.0, 2.0, 3.0).zipWithIndex.map { case (v, d) =>
        (d.toLong * day, "lin", v) } ++
      Seq(0.0, 1.0, 2.0, 100.0).zipWithIndex.map { case (v, d) =>
        (d.toLong * day, "out", v) } ++
      Seq((0L * day, "neg2", 1.0), (2L * day, "neg2", 0.999999))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.theilSenTrend(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_days"), x.getAs[Long]("n_pairs"),
          x.getAs[Long]("med_x2"), x.getAs[Long]("ts_slope_micro"))))
      .toMap
    assert(r("lin") === ((4L, 6L, 2000000L, 1000000L)))
    // out slopes (micros): 1e6 x3, 33333333, 49500000, 98000000 →
    // middle two are 1e6 and 33333333
    assert(r("out") === ((4L, 6L, 34333333L, 17166666L)))
    assert(r("neg2") === ((2L, 1L, -2L, -1L)))
  }

  test("benfordAudit: string-of-cents digits, zero-obs spine rows, exact table") {
    // cents: 100→1, 250→2, 3000→3, 95→9, 9500→9
    val orders = Seq(1.00, 2.50, 30.00, 0.95, 95.00).toDF("o_totalprice")
    val r = RelationalOps.benfordAudit(orders).collect()
      .map(x => x.getAs[Long]("digit") ->
        ((x.getAs[Long]("n_obs"), x.getAs[Long]("share_micro"),
          x.getAs[Long]("benford_micro"))))
      .toMap
    assert(r.size === 9, "all nine digits keep a spine row")
    assert(r(1L)._1 === 1L && r(2L)._1 === 1L && r(3L)._1 === 1L)
    assert(r(9L) === ((2L, 400000L, 45757L)))
    assert(r(4L)._1 === 0L && r(4L)._2 === 0L, "absent digit keeps n_obs = 0")
    assert(r.values.map(_._3).sum === 1000000L,
      "the literal Benford table partitions unity in micros exactly")
  }
  test("q5LocalSupplier: only same-nation customer-supplier pairs count, window and region filter hold") {
    val region = Seq((0L, "ASIA"), (1L, "OTHER")).toDF("r_regionkey", "r_name")
    val nation = Seq((1L, "N1", 0L), (2L, "N2", 0L), (3L, "N3", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val supplier = Seq((20L, 1L), (21L, 2L), (22L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (100L, 10L, ts("1996-02-01")), (101L, 11L, ts("1996-07-01")),
      (102L, 12L, ts("1996-03-01")), // region OTHER — filtered
      (103L, 10L, ts("1997-06-01"))) // out of the year window
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (100L, 20L, 10.0, 0.0), // N1 customer x N1 supplier: counts
      (100L, 21L, 10.0, 0.0), // N1 customer x N2 supplier: NOT local
      (101L, 21L, 10.0, 0.0), // N2 x N2: counts
      (102L, 22L, 10.0, 0.0), (103L, 20L, 10.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val r = RelationalOps.q5LocalSupplier(customer, orders, lineitem,
        supplier, nation, region).orderBy("rank").collect()
      .map(x => (x.getAs[Long]("rank"), x.getAs[String]("n_name"),
        x.getAs[Long]("revenue_cp"), x.getAs[Long]("n_items")))
    assert(r.toSeq === Seq((1L, "N1", 100000L, 1L), (2L, "N2", 100000L, 1L)))
  }

  test("q10ReturnedItems: only R-flag lines in the quarter count; exact cents; ranked") {
    val customer = Seq((7L, "C7", 12.345, 1L), (8L, "C8", 0.0, 1L))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, 7L, ts("1996-02-01")), (2L, 8L, ts("1996-03-15")),
      (3L, 7L, ts("1995-12-31")), (4L, 7L, ts("1996-02-02")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1L, "R", 10.0, 0.0), (1L, "N", 10.0, 0.0), // N flag excluded
      (2L, "R", 20.0, 0.5), (4L, "R", 5.0, 0.0),
      (3L, "R", 10.0, 0.0)) // out of the quarter
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val r = RelationalOps.q10ReturnedItems(customer, orders, lineitem, nation)
      .orderBy("rank").collect()
      .map(x => (x.getAs[Long]("rank"), x.getAs[String]("c_name"),
        x.getAs[String]("n_name"), x.getAs[Double]("c_acctbal"),
        x.getAs[Long]("revenue_cp"), x.getAs[Long]("n_returned")))
    assert(r.toSeq === Seq(
      (1L, "C7", "N1", 12.35, 150000L, 2L),
      (2L, "C8", "N1", 0.0, 100000L, 1L)))
  }

  test("q18LargeOrders: strict HAVING cut, exact cents, broadcast dim attributes") {
    val customer = Seq((7L, "Customer#7", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val t0 = java.sql.Timestamp.valueOf("1997-03-05 00:00:00")
    val orders = Seq(
      (1L, 7L, "F", 1234.56, t0, "1-URGENT"),
      (2L, 7L, "F", 99.99, t0, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // order 1 sums 301 (> 300, kept); order 2 sums exactly 300 (cut)
    val lineitem = Seq((1L, 200.0), (1L, 101.0), (2L, 300.0))
      .toDF("l_orderkey", "l_quantity")
    val r = RelationalOps.q18LargeOrders(customer, orders, lineitem).collect()
    assert(r.length === 1)
    val g = r.head
    assert(g.getAs[Long]("rank") === 1L)
    assert(g.getAs[String]("c_name") === "Customer#7")
    assert(g.getAs[Long]("o_orderkey") === 1L)
    assert(g.getAs[String]("order_date") === "1997-03-05")
    assert(g.getAs[Long]("total_cents") === 123456L)
    assert(g.getAs[Long]("sum_qty") === 301L)
  }

  test("q4OrderPriority: EXISTS semantics — one count per order, strict lateness, window cut") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, ts("1996-02-01"), "1-URGENT"), // two late lines -> counted ONCE
      (2L, ts("1996-02-01"), "2-HIGH"),   // on-time + exactly-60-days -> excluded
      (3L, ts("1995-12-01"), "1-URGENT")) // late line but out of quarter
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, ts("1996-05-01")), (1L, ts("1996-06-01")),
      (2L, ts("1996-02-10")), (2L, ts("1996-04-01")), // +60 days exactly: NOT late
      (3L, ts("1996-06-01")))
      .toDF("l_orderkey", "l_shipdate")
    val r = RelationalOps.q4OrderPriority(orders, lineitem).collect()
      .map(x => x.getAs[String]("o_orderpriority") -> x.getAs[Long]("order_count"))
    assert(r.toSeq === Seq("1-URGENT" -> 1L))
  }

  test("q21SuppliersKeptWaiting: sole-late charged; co-late, solo-supplier and open orders not") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val supplier = Seq((10L, "S10", 1L), (20L, "S20", 1L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val orders = Seq(
      (1L, "F", ts("1996-01-01")), // s10 late, s20 on time -> s10 charged
      (2L, "F", ts("1996-01-01")), // both late -> NOT EXISTS kills both
      (3L, "F", ts("1996-01-01")), // s10 late but SOLE supplier -> EXISTS kills
      (4L, "O", ts("1996-01-01"))) // open order -> status filter kills
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val late = ts("1996-06-01"); val ok = ts("1996-01-15")
    val lineitem = Seq(
      (1L, 10L, late), (1L, 10L, late), (1L, 20L, ok), // dup late lines: ONE incident
      (2L, 10L, late), (2L, 20L, late),
      (3L, 10L, late),
      (4L, 10L, late), (4L, 20L, ok))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val r = RelationalOps.q21SuppliersKeptWaiting(supplier, orders, lineitem, nation)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("s_name") === "S10")
    assert(r.head.getAs[String]("n_name") === "N1")
    assert(r.head.getAs[Long]("numwait") === 1L, "distinct incidents, not line rows")
    assert(r.head.getAs[Long]("rank") === 1L)
  }

  test("q2MinCostSupplier: correlated-min ties keep both suppliers; size filter prunes") {
    val part = Seq(
      (1L, "P1", "STANDARD", 15), (2L, "P2", "PROMO", 15), (3L, "P3", "SMALL", 9))
      .toDF("p_partkey", "p_name", "p_type", "p_size")
    val supplier = Seq(
      (1L, "S1", 100.0, 1L), (2L, "S2", 50.0, 1L), (3L, "S3", 10.0, 1L))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val lineitem = Seq(
      (1L, 1L, 10.0), (1L, 1L, 11.0), // s1 offer for p1: min 1000 cents
      (1L, 2L, 10.0),                 // s2 ties at 1000 -> BOTH kept
      (1L, 3L, 12.0),                 // s3 above the min -> dropped
      (2L, 1L, 5.0),                  // p2: s1 alone
      (3L, 1L, 1.0))                  // p3 excluded by size
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val r = RelationalOps.q2MinCostSupplier(part, supplier, lineitem, nation)
      .collect()
      .map(x => (x.getAs[String]("s_name"), x.getAs[Long]("p_partkey"),
        x.getAs[Long]("cost_cp"), x.getAs[Double]("s_acctbal")))
    // ordered by s_acctbal desc then part
    assert(r.toSeq === Seq(
      ("S1", 1L, 1000L, 100.0), ("S1", 2L, 500L, 100.0), ("S2", 1L, 1000L, 50.0)))
  }

  test("q11ImportantStock: nation slice only; value·n > 3·total keeps the outsized part") {
    val nation = Seq((1L, "NATION_3"), (2L, "NX")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, 1L), (2L, 2L)).toDF("s_suppkey", "s_nationkey")
    // s1 (in-nation): p1..p5 worth 1000 each, p6 worth 100000
    // (cost 10000 cp × avail 10) — mean 17500, only p6 > 3× mean.
    // s2's p7 row is out-of-nation and must not enter the total.
    val lineitem =
      ((1L to 5L).map(p => (p, 1L, 10.0, 1.0)) ++
        Seq((6L, 1L, 100.0, 10.0), (7L, 2L, 500.0, 100.0)))
        .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val r = RelationalOps.q11ImportantStock(supplier, lineitem, nation)
      .collect().map(x =>
        x.getAs[Long]("ps_partkey") -> x.getAs[Long]("value_cp"))
    assert(r.toSeq === Seq(6L -> 100000L))
  }

  test("q16PartSupplierCounts: complaints/brand/type/size excluded; suppliers distinct") {
    val part = Seq(
      (1L, "Brand#2", "STANDARD", 5),  // in
      (2L, "Brand#1", "STANDARD", 5),  // excluded brand
      (3L, "Brand#2", "MEDIUMX", 5),   // excluded type prefix
      (4L, "Brand#2", "STANDARD", 7))  // size outside the set
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
    val lineitem = Seq(
      (1L, 1L), (1L, 1L), // duplicate pair counts once
      (1L, 2L),           // complaint supplier -> NOT IN drops
      (1L, 3L),
      (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("l_partkey", "l_suppkey")
    val r = RelationalOps.q16PartSupplierCounts(part, supplier, lineitem)
      .collect().map(x => (x.getAs[String]("p_brand"), x.getAs[String]("p_type"),
        x.getAs[Long]("p_size"), x.getAs[Long]("supplier_cnt")))
    assert(r.toSeq === Seq(("Brand#2", "STANDARD", 5L, 2L)))
  }

  test("q20PotentialPromotion: only the over-2×-mean holder of a red part qualifies") {
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, "S1", 1L), (2L, "S2", 1L), (3L, "S3", 1L), (4L, "S4", 1L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq((1L, "red bolt"), (2L, "blue bolt"))
      .toDF("p_partkey", "p_name")
    // red p1: avail 10/1/1 -> mean 4, threshold 2×mean=8: only S1.
    // blue p2: S4 holds 100 but the part is not red -> excluded.
    val lineitem = Seq(
      (1L, 1L, 1.0, 10.0), (1L, 2L, 1.0, 1.0), (1L, 3L, 1.0, 1.0),
      (2L, 4L, 1.0, 100.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val r = RelationalOps.q20PotentialPromotion(part, supplier, lineitem, nation)
      .collect().map(x => (x.getAs[String]("s_name"), x.getAs[String]("n_name")))
    assert(r.toSeq === Seq(("S1", "N1")))
  }

  test("q9ProductTypeProfit: derived min-cost book; negative sum truncates toward zero") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((1L, "dark red gear"), (2L, "blue gear"))
      .toDF("p_partkey", "p_name")
    val orders = Seq((1L, ts("1996-03-01"))).toDF("o_orderkey", "o_orderdate")
    // cost book for (p1,s1): min(1000, 2000) = 1000 cp.
    // line1: 1000·100 − 1000·100·1 = 0
    // line2: 2000·(100−13) − 1000·100·2 = −26000 cent·pct
    // sum −26000 div 10000 = −2 (truncation toward zero; floor is −3)
    val lineitem = Seq(
      (1L, 1L, 1L, 10.0, 0.0, 1.0),
      (1L, 1L, 1L, 20.0, 0.13, 2.0),
      (1L, 2L, 1L, 99.0, 0.0, 1.0)) // non-red part: excluded
      .toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    val r = RelationalOps.q9ProductTypeProfit(part, supplier, lineitem, orders, nation)
      .collect().map(x => (x.getAs[String]("nation"), x.getAs[Long]("o_year"),
        x.getAs[Long]("profit_dollars")))
    assert(r.toSeq === Seq(("N1", 1996L, -2L)))
  }

  test("eventsValueRanks: ties share a rank, rank gaps, dense_rank compacts") {
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 2.0), (4L, "b", 9.0))
    val events = rows.map { case (id, t, v) => (id, 1L, id, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsValueRanks(events).collect()
      .map(x => x.getAs[Long]("event_id") ->
        ((x.getAs[Long]("rnk"), x.getAs[Long]("drnk")))).toMap
    assert(r(1L) === ((1L, 1L)) && r(2L) === ((1L, 1L)), "tie shares rank 1")
    assert(r(3L) === ((3L, 2L)), "rank gaps past the tie, dense_rank compacts")
    assert(r(4L) === ((1L, 1L)))
  }

  test("eventsMoments: hand-computed skew/kurtosis; constant series to explicit zeros") {
    val rows = Seq(
      ("sym", 1.0), ("sym", 2.0), ("sym", 3.0),     // skew 0, kurt_ex -1.5
      ("skw", 0.0), ("skw", 0.0), ("skw", 3.0),     // skew 1/sqrt(2), kurt_ex -1.5
      ("cst", 5.0), ("cst", 5.0))                   // constant: explicit zeros
    val events = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, 1L, i.toLong, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsMoments(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("mean_milli"),
          x.getAs[Double]("skewness"), x.getAs[Double]("kurtosis_ex")))).toMap
    assert(r("sym") === ((3L, 2000L, 0.0, -1.5)))
    assert(r("skw")._3 === 0.707107, "skew of {0,0,3} = 1/sqrt(2)")
    assert(r("skw")._4 === -1.5)
    assert(r("cst") === ((2L, 5000L, 0.0, 0.0)))
  }

  test("sessionizeNative: gap merge, exact-gap MERGES (touching windows), over-gap splits") {
    val m = 60L * 1000 * 1000 * 1000 // one minute in nanos
    val events = Seq(
      (1L, 1L, 0L), (2L, 1L, 10 * m), // merge (10 min < 30)
      (3L, 1L, 40 * m),               // exactly 30 min after: MERGES (touching)
      (5L, 1L, 71 * m),               // 31 min after: new session
      (4L, 2L, 0L))
      .toDF("event_id", "user_id", "ts")
    val r = RelationalOps.sessionizeNative(events).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("session_start_us"),
        x.getAs[Long]("session_end_us"), x.getAs[Long]("n_events"))).toSet
    val us = 60L * 1000 * 1000 // one minute in micros
    assert(r === Set(
      (1L, 0L, 70 * us, 3L),          // [0, 10, 40] + 30-min gap -> end 70
      (1L, 71 * us, 101 * us, 1L),    // the 31-min gap opens a new one
      (2L, 0L, 30 * us, 1L)))
  }

  test("exceptAll/intersectAll: multiset multiplicities subtract and min, never collapse") {
    // A = {x, x, x, y}, B = {x, z}: EXCEPT ALL = {x, x, y},
    // INTERSECT ALL = {x} — the DISTINCT variants would lose the
    // duplicate x entirely
    val events = Seq(
      (2L, 1L, "x"), (4L, 1L, "x"), (8L, 1L, "x"), (10L, 1L, "y"), // A: %2
      (3L, 1L, "x"), (9L, 1L, "z"))                                // B: %3
      .toDF("event_id", "user_id", "event_type")
    val ex = RelationalOps.exceptAllEvents(events).collect()
      .map(_.getAs[String]("event_type")).sorted.toSeq
    assert(ex === Seq("x", "x", "y"))
    val in = RelationalOps.intersectAllEvents(events).collect()
      .map(_.getAs[String]("event_type")).toSeq
    assert(in === Seq("x"))
  }

  test("nullAwareAntiJoinReceipt: NOT IN collapses to 0 on a null key; NOT EXISTS doesn't") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (1L, 1L, "F"),    // key 1
      (100L, 2L, "F"),  // orderkey % 100 == 0 -> NULL key injected
      (3L, 2L, "O"))    // non-F: excluded from the key list
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val r = RelationalOps.nullAwareAntiJoinReceipt(customer, orders).collect().head
    assert(r.getAs[Long]("n_null_keys") === 1L)
    assert(r.getAs[Long]("n_not_in_with_null") === 0L,
      "one NULL makes NOT IN unknown for every row")
    // clean key list = {1}: customers 2 and 3 pass
    assert(r.getAs[Long]("n_not_in_clean") === 2L)
    assert(r.getAs[Long]("n_not_exists") === 2L, "NOT EXISTS is null-indifferent")
  }

  test("eventsUnpivot: melt(pivot(x)) round-trips to the plain census") {
    val events = Seq(
      (1L, 10L, "click"), (2L, 10L, "click"), (3L, 10L, "view"),
      (4L, 20L, "error"))
      .toDF("event_id", "user_id", "event_type")
    val r = RelationalOps.eventsUnpivot(events).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type"),
        x.getAs[Long]("n"))).toSet
    assert(r === Set((10L, "click", 2L), (10L, "view", 1L), (20L, "error", 1L)),
      "zero cells dropped, counts preserved")
  }

  test("groupingSetsPricing: exactly the three declared levels, gid disambiguates") {
    val lineitem = Seq(
      ("A", "F", 1.0), ("A", "O", 2.0), ("N", "F", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val r = RelationalOps.groupingSetsPricing(lineitem).collect()
      .map(x => (x.getAs[String]("returnflag"), x.getAs[String]("linestatus"),
        x.getAs[Long]("gid"), x.getAs[Long]("sum_qty"), x.getAs[Long]("n"))).toSet
    assert(r === Set(
      ("A", "ALL", 1L, 3L, 2L), ("N", "ALL", 1L, 4L, 1L),
      ("ALL", "F", 2L, 5L, 2L), ("ALL", "O", 2L, 2L, 1L),
      ("ALL", "ALL", 3L, 7L, 3L)))
    // no (flag, status) pairs — grouping sets, not cube
    assert(r.size === 5)
  }

  test("q6ForecastRevenue: band and cap filters, exact cent*pct revenue") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val lineitem = Seq(
      (ts("1996-03-01"), 100.0, 0.06, 10.0), // in: 10000 * 6
      (ts("1996-03-01"), 100.0, 0.04, 10.0), // discount below band
      (ts("1996-03-01"), 100.0, 0.06, 24.0), // quantity at cap: excluded
      (ts("1997-03-01"), 100.0, 0.06, 10.0)) // out of year
      .toDF("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
    val r = RelationalOps.q6ForecastRevenue(lineitem).collect().head
    assert(r.getAs[Long]("n_items") === 1L)
    assert(r.getAs[Long]("revenue_cp_pct") === 60000L)
  }

  test("q14PromoRevenue: conditional split and exact floored micro share") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (1L, ts("1996-09-10"), 10.0, 0.0),  // promo: 1000*100
      (2L, ts("1996-09-10"), 30.0, 0.0),  // other: 3000*100
      (1L, ts("1996-10-01"), 99.0, 0.0))  // out of month
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val r = RelationalOps.q14PromoRevenue(lineitem, part).collect().head
    assert(r.getAs[Long]("promo_cp_pct") === 100000L)
    assert(r.getAs[Long]("total_cp_pct") === 400000L)
    assert(r.getAs[Long]("promo_share_micro") === 250000L) // exactly 1/4
  }

  test("q17SmallQuantityRevenue: integer-exact 0.2*avg threshold, brand-pruned") {
    val part = Seq((1L, "Brand#1"), (2L, "Brand#1"), (3L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
    // part 1: qties 1, 9, 10 -> avg 20/3, cutoff 4/3: only qty 1 kept
    // part 2: qties 2, 10 -> avg 6, cutoff 1.2: nothing below
    // part 3: wrong brand, tiny qty would otherwise qualify
    val lineitem = Seq(
      (1L, 1.0, 11.0), (1L, 9.0, 99.0), (1L, 10.0, 1.0),
      (2L, 2.0, 5.0), (2L, 10.0, 5.0),
      (3L, 1.0, 100.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = RelationalOps.q17SmallQuantityRevenue(lineitem, part).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("p_brand") === "Brand#1")
    assert(r.head.getAs[Long]("n_small") === 1L)
    assert(r.head.getAs[Long]("revenue_cp") === 1100L)
  }

  test("q19DisjunctiveRevenue: each branch binds its own bands") {
    val part = Seq(
      (1L, "Brand#12", 3), (2L, "Brand#12", 9),  // 2: size out for brand 12
      (3L, "Brand#23", 9), (4L, "Brand#34", 15))
      .toDF("p_partkey", "p_brand", "p_size")
    val lineitem = Seq(
      (1L, 5.0, 10.0, 0.0),   // brand12 branch: in
      (1L, 15.0, 10.0, 0.0),  // qty out for brand12 (and not in others' sizes)
      (2L, 5.0, 10.0, 0.0),   // size out
      (3L, 12.0, 20.0, 0.5),  // brand23 branch: in, 50% discount
      (4L, 25.0, 30.0, 0.0),  // brand34 branch: in
      (4L, 35.0, 30.0, 0.0))  // qty above the union cap
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = RelationalOps.q19DisjunctiveRevenue(lineitem, part).collect().head
    assert(r.getAs[Long]("n_items") === 3L)
    // 1000*100 + 2000*50 + 3000*100 = 500000
    assert(r.getAs[Long]("revenue_cp_pct") === 500000L)
  }

  test("q22GlobalBalance: above positive-average balance and idle since the cutoff") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val nation = Seq((1L, "N1"), (2L, "N2")).toDF("n_nationkey", "n_name")
    // positive balances: 100, 200, 600 -> avg 300; negatives excluded
    val customer = Seq(
      (1L, 1L, 600.0),  // above avg, idle -> kept
      (2L, 1L, 200.0),  // below avg
      (3L, 2L, 100.0),  // below avg
      (4L, 2L, -50.0),  // negative: excluded from avg AND below it
      (5L, 2L, 600.0))  // above avg but ordered recently
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (10L, 5L, ts("2000-01-01")),  // recent -> disqualifies 5
      (11L, 1L, ts("1998-01-01")))  // old -> does not disqualify 1
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val r = RelationalOps.q22GlobalBalance(customer, orders, nation).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("n_name") === "N1")
    assert(r.head.getAs[Long]("n_cust") === 1L)
    assert(r.head.getAs[Long]("total_bal_cp") === 60000L)
  }

  test("q7VolumeShipping: both directions, same-nation pairs excluded, year buckets") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val nation = Seq((1L, "NATION_1"), (2L, "NATION_2"), (3L, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L), (20L, 2L)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((100L, 2L), (200L, 1L), (300L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 100L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (1L, 10L, ts("1996-05-01"), 10.0, 0.0),  // N1 -> N2, 1996
      (2L, 20L, ts("1997-05-01"), 20.0, 0.0),  // N2 -> N1, 1997
      (3L, 10L, ts("1996-05-01"), 99.0, 0.0),  // N1 -> N3: pair excluded
      (4L, 20L, ts("1996-05-01"), 5.0, 0.0),   // N2 -> N2: same-nation excluded
      (1L, 10L, ts("1999-05-01"), 7.0, 0.0))   // out of window
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val r = RelationalOps.q7VolumeShipping(lineitem, orders, customer,
        supplier, nation).collect()
      .map(x => (x.getAs[String]("supp_nation"), x.getAs[String]("cust_nation"),
        x.getAs[Long]("l_year"), x.getAs[Long]("n"), x.getAs[Long]("revenue")))
    assert(r.toSeq === Seq(
      ("NATION_1", "NATION_2", 1996L, 1L, 100000L),
      ("NATION_2", "NATION_1", 1997L, 1L, 200000L)))
  }

  test("q8MarketShare: region/type pruned, conditional share per year, exact micros") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val region = Seq((1L, "ASIA"), (2L, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((1L, "NATION_1", 1L), (2L, "NATION_2", 1L), (3L, "NATION_3", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val supplier = Seq((10L, 1L), (20L, 2L)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((100L, 2L), (200L, 3L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, 100L, ts("1996-03-01")), (2L, 100L, ts("1997-03-01")),
      (3L, 200L, ts("1996-03-01")))  // EUROPE customer: out of region
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1L, 1L, 10L, 40.0, 0.0),  // 1996, NATION_1 supplier: counted in share
      (1L, 1L, 20L, 60.0, 0.0),  // 1996, NATION_2 supplier: total only
      (2L, 1L, 10L, 10.0, 0.0),  // 1997
      (1L, 2L, 10L, 99.0, 0.0),  // wrong part type
      (3L, 1L, 10L, 99.0, 0.0))  // out-of-region customer
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val r = RelationalOps.q8MarketShare(lineitem, orders, customer, supplier,
        nation, region, part = part).collect()
      .map(x => (x.getAs[Long]("o_year"), x.getAs[Long]("nation_rev"),
        x.getAs[Long]("total_rev"), x.getAs[Long]("n"),
        x.getAs[Long]("share_micro")))
    assert(r.toSeq === Seq(
      (1996L, 400000L, 1000000L, 2L, 400000L),
      (1997L, 100000L, 100000L, 1L, 1000000L)))
  }

  test("q15TopSupplier: scalar-max equality keeps ties, quarter window") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (1L, ts("1996-02-01"), 50.0, 0.0), (1L, ts("1996-02-02"), 50.0, 0.0),
      (2L, ts("1996-02-01"), 100.0, 0.0),  // ties supplier 1 at 100*100 cp*pct
      (3L, ts("1996-02-01"), 30.0, 0.0),
      (3L, ts("1996-06-01"), 999.0, 0.0))  // out of quarter
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val r = RelationalOps.q15TopSupplier(lineitem, supplier).collect()
      .map(x => (x.getAs[Long]("s_suppkey"), x.getAs[String]("s_name"),
        x.getAs[Long]("total_rev")))
    assert(r.toSeq === Seq((1L, "S1", 1000000L), (2L, "S2", 1000000L)),
      "both max-achieving suppliers kept")
  }

  test("q13CustomerDistribution: zero-order customers land in the 0 bucket; priority excluded") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (1L, 1L, "2-HIGH"), (2L, 1L, "5-LOW"), (3L, 1L, "1-URGENT"), // urgent excluded
      (4L, 2L, "1-URGENT")) // customer 2's only order excluded -> 0 bucket
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = RelationalOps.q13CustomerDistribution(customer, orders).collect()
      .map(x => (x.getAs[Long]("c_count"), x.getAs[Long]("custdist")))
    assert(r.toSeq === Seq((0L, 2L), (2L, 1L)), "custdist desc, c_count desc")
  }
  test("eventsEwma: textbook recurrence, trailing-window cut, floored negatives") {
    val day = 86400L * 1000 * 1000 * 1000
    // 'abc': days 0..2 values 4,2,8 → S = ((4)+2)/2 = 3, (3+8)/2 = 5.5
    // 'long': 40 constant days → only the trailing 32 enter
    // 'neg': days 0,1 values 0, -0.000001 → scaled -1, denom 2 →
    //        floor gives -1 where truncation would give 0
    val rows =
      Seq((0L, 4.0), (1L, 2.0), (2L, 8.0)).map { case (d, v) => (d * day, "abc", v) } ++
      (0L until 40L).map(d => (d * day, "long", 7.0)) ++
      Seq((0L * day, "neg", 0.0), (1L * day, "neg", -0.000001))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsEwma(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_days"), x.getAs[Long]("last_micro"),
          x.getAs[Long]("mean_micro"), x.getAs[Long]("ewma_micro"))))
      .toMap
    assert(r("abc") === ((3L, 8000000L, 4666666L, 5500000L)))
    assert(r("long") === ((32L, 7000000L, 7000000L, 7000000L)))
    assert(r("neg") === ((2L, -1L, -1L, -1L)), "floored, not truncated")
  }
  test("eventsPeriodogram: weekly square wave puts the energy at k=4, constant ties to k=1") {
    val day = 86400L * 1000 * 1000 * 1000
    // 'weekly': 28 days, 3 high days then 4 low per week; 'flat':
    // constant — all energies 0, dominant falls to lowest k by tie
    val rows =
      (0L until 28L).map(d => (d * day, "weekly", if (d % 7 < 3) 10.0 else 2.0)) ++
      (0L until 28L).map(d => (d * day, "flat", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsPeriodogram(events).collect()
    val weeklyDom = r.filter(x => x.getAs[String]("event_type") == "weekly"
      && x.getAs[Boolean]("dominant"))
    assert(weeklyDom.length === 1)
    assert(weeklyDom.head.getAs[Long]("k") === 4L, "k=4 IS the 7-day cycle")
    assert(weeklyDom.head.getAs[Long]("period_days") === 7L)
    val flat = r.filter(_.getAs[String]("event_type") == "flat")
    assert(flat.forall(_.getAs[Long]("energy_milli2") === 0L))
    // declared output is BIGINT, not DECIMAL — the driver-hashable
    // envelope rule (SURVEY §5)
    assert(r.head.schema("energy_milli2").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(flat.filter(_.getAs[Boolean]("dominant")).head.getAs[Long]("k") === 1L)
    assert(r.count(_.getAs[Boolean]("dominant")) === 2, "one dominant per type")
  }

  test("eventsRankProfile: the four rank builtins agree over one shared window") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows = Seq(
      (0L * day, "a", 3.0), (1L * day, "a", 1.0), (2L * day, "a", 2.0),
      (0L * day, "b", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsRankProfile(events).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("day")) ->
        ((x.getAs[Double]("pr"), x.getAs[Double]("cd"),
          x.getAs[Long]("first_mm"), x.getAs[Any]("second_mm"))))
      .toMap
    assert(r(("a", 1L)) === ((0.0, 0.333333, 1000000L, 2000000L)))
    assert(r(("a", 2L)) === ((0.5, 0.666667, 1000000L, 2000000L)))
    assert(r(("a", 0L)) === ((1.0, 1.0, 1000000L, 2000000L)))
    // a single-day type: percent_rank 0, cume_dist 1, no second value
    assert(r(("b", 0L)) === ((0.0, 1.0, 5000000L, null)))
  }

  test("psiDrift: a total shift is major, an identical mix is stable, a one-half type is flagged") {
    val day = 86400L * 1000 * 1000 * 1000
    // global bounds: days 0..9 (split at 5), values 0..10 (bin = v)
    val rows =
      (0L until 5L).map(d => (d * day, "shifted", 0.0)) ++
      (5L until 10L).map(d => (d * day, "shifted", 10.0)) ++
      (0L until 10L).map(d => (d * day, "same", 5.0)) ++
      (0L until 2L).map(d => (d * day, "onlyearly", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.psiDrift(events).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    // shifted: bin0 (6/15 -> 1/15) + bin9 (1/15 -> 6/15), each
    // (1/3)*ln(6) = 0.597253 -> psi 1.194506
    assert(r("shifted").getAs[Double]("psi") === 1.194506)
    assert(r("shifted").getAs[String]("verdict") === "major")
    assert(r("same").getAs[Double]("psi") === 0.0, "equal halves smooth to equal shares")
    assert(r("same").getAs[String]("verdict") === "stable")
    assert(!r("onlyearly").getAs[Boolean]("comparable"))
    assert(r("onlyearly").isNullAt(r("onlyearly").fieldIndex("psi")))
    assert(r("onlyearly").isNullAt(r("onlyearly").fieldIndex("verdict")))
  }

  test("spearmanTrend: monotone rise scores 1, ties use average ranks, constant guards to 0") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows =
      (0L until 10L).map(d => (d * day, "up", d.toDouble)) ++
      (0L until 10L).map(d => (d * day, "const", 5.0)) ++
      // steps 1,1,2,2: ry2 = 3,3,7,7 against rx2 = 2,4,6,8
      Seq((0L * day, "steps", 1.0), (1L * day, "steps", 1.0),
        (2L * day, "steps", 2.0), (3L * day, "steps", 2.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.spearmanTrend(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_days"), x.getAs[Double]("rho"),
          x.getAs[Boolean]("monotone")))).toMap
    assert(r("up") === ((10L, 1.0, true)))
    assert(r("const") === ((10L, 0.0, false)), "zero rank variance guards, not 0/0")
    // 64 / sqrt(80 * 64) = 0.894427
    assert(r("steps") === ((4L, 0.894427, true)))
  }

  test("runsTest: alternation and blocks both reject randomness; a constant series drops out") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows =
      (0L until 10L).map(d => (d * day, "alt", if (d % 2 == 0) 10.0 else 0.0)) ++
      (0L until 10L).map(d => (d * day, "blocks", if (d < 5) 10.0 else 0.0)) ++
      (0L until 10L).map(d => (d * day, "const", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.runsTest(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_above"), x.getAs[Long]("n_below"),
          x.getAs[Long]("n_runs"), x.getAs[Double]("z"),
          x.getAs[Boolean]("nonrandom")))).toMap
    // n1 = n2 = 5: mu = 6, sd = sqrt(2000/900) = 1.490712
    assert(r("alt") === ((5L, 5L, 10L, 2.683282, true)), "too many runs")
    assert(r("blocks") === ((5L, 5L, 2L, -2.683282, true)), "too few runs")
    assert(!r.contains("const"), "every day equals the median - no runs question")
  }

  test("seasonalDecompose: a pure weekly pattern decomposes with zero residual; flat series guards") {
    val day = 86400L * 1000 * 1000 * 1000
    // 'weekly': value 8 on dow 0, 1 otherwise — MA over any full week
    // is constant 2, so detrended IS the seasonal profile exactly
    val rows =
      (0L until 28L).map(d => (d * day, "weekly", if (d % 7 == 0) 8.0 else 1.0)) ++
      (0L until 28L).map(d => (d * day, "flat", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.seasonalDecompose(events).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("dow")) ->
        ((x.getAs[Long]("seasonal_micro"),
          Option(x.get(x.fieldIndex("strength_micro")))))).toMap
    assert(r(("weekly", 0L))._1 === 6000000L)
    (1L to 6L).foreach(d => assert(r(("weekly", d))._1 === -1000000L))
    assert(r(("weekly", 3L))._2 === Some(1000000L),
      "perfectly periodic: the weekly profile explains everything")
    (0L to 6L).foreach { d =>
      assert(r(("flat", d))._1 === 0L)
      assert(r(("flat", d))._2 === None, "zero detrended mass guards to null")
    }
  }

  test("weightedMedian: quantity weight pulls the median; even totals split in exact half-cents") {
    val li = Seq(
      ("A", 1.0, 1L), ("A", 2.0, 10L), ("A", 3.0, 1L),
      ("B", 1.0, 100L), ("B", 2.0, 1L), ("B", 3.0, 1L),
      ("C", 1.0, 1L), ("C", 2.0, 1L)
    ).toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val r = RelationalOps.weightedMedian(li).collect()
      .map(x => x.getAs[String]("flag") ->
        ((x.getAs[Long]("total_qty"), x.getAs[Long]("n_lines"),
          x.getAs[Long]("weighted_median_cp"), x.getAs[Long]("median_cp")))).toMap
    assert(r("A") === ((12L, 3L, 200L, 200L)))
    assert(r("B") === ((102L, 3L, 100L, 200L)),
      "the 100-unit line drags the weighted median to its price")
    assert(r("C") === ((2L, 2L, 150L, 150L)), "even split floors to half-cents")
  }

  test("eagerAggReceipt: eager and late aggregation agree cent-for-cent; collapse factors counted") {
    val nation = Seq((1L, "A", 0L), (2L, "B", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((10L, 1L), (11L, 2L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 10L), (101L, 10L), (102L, 11L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (100L, 10.0, 0.10), (100L, 10.0, 0.10),
      (101L, 20.0, 0.00), (102L, 5.0, 0.25)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val r = RelationalOps.eagerAggReceipt(customer, orders, lineitem, nation)
      .collect()
      .map(x => x.getAs[String]("n_name") ->
        ((x.getAs[Long]("n_lineitems"), x.getAs[Long]("n_orders"),
          x.getAs[Long]("n_customers"), x.getAs[Long]("revenue_cp"),
          x.getAs[Boolean]("ok")))).toMap
    assert(r("A") === ((3L, 2L, 1L, 380000L, true)))
    assert(r("B") === ((1L, 1L, 1L, 37500L, true)))
  }

  test("paretoFront: dominated points drop, equal-price smaller sizes drop, exact ties survive together") {
    val part = Seq(
      (1L, 100.0, 5), (2L, 100.0, 7), (3L, 200.0, 10), (4L, 150.0, 7),
      (5L, 300.0, 10), (6L, 50.0, 1), (7L, 200.0, 10)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val r = RelationalOps.paretoFront(part).orderBy("rank").collect()
      .map(x => (x.getAs[Long]("rank"), x.getAs[Long]("price_cp"),
        x.getAs[Long]("p_size"), x.getAs[Long]("n_parts"),
        x.getAs[Long]("first_part")))
    assert(r.toSeq === Seq(
      (1L, 5000L, 1L, 1L, 6L),    // cheapest: nothing cheaper reaches size 1
      (2L, 10000L, 7L, 1L, 2L),   // (100, 5) dominated by its own price level
      (3L, 20000L, 10L, 2L, 3L))) // the (200, 10) duplicates survive together
    // (150, 7) dominated by the cheaper equal-size (100, 7);
    // (300, 10) dominated by the cheaper equal-size (200, 10)
  }

  test("mannKendall: monotone series trend, all-tied variance guards to 0, exact S and var18") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows =
      (0L until 10L).map(d => (d * day, "up", d.toDouble)) ++
      (0L until 10L).map(d => (d * day, "down", (20 - d).toDouble)) ++
      (0L until 10L).map(d => (d * day, "const", 5.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.mannKendall(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_days"), x.getAs[Long]("s_stat"),
          x.getAs[Long]("var18"), x.getAs[Double]("z"),
          x.getAs[Boolean]("trending")))).toMap
    // 45 concordant pairs, no ties: var18 = 10*9*25 = 2250
    assert(r("up") === ((10L, 45L, 2250L, 3.93548, true)))
    assert(r("down") === ((10L, -45L, 2250L, -3.93548, true)))
    // all days tied: tie_term cancels var18 exactly -> z = 0, no trend
    assert(r("const") === ((10L, 0L, 0L, 0.0, false)))
  }

  test("tailIndex: exact Hill fold over the census; zero values filtered; all-tied tails emit no row") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows =
      // 'a': values 8, 4, 2, 1 -> with k=2: ref = 3rd largest (2.00),
      // sum = ln(4) + ln(2) rounded per term
      Seq((0L * day, "a", 8.0), (1L * day, "a", 4.0),
        (2L * day, "a", 2.0), (3L * day, "a", 1.0)) ++
      // 'b': top-(k+1) all equal -> nothing exceeds the ref -> no row
      Seq((0L * day, "b", 5.0), (1L * day, "b", 5.0), (2L * day, "b", 5.0)) ++
      // 'c': only zeros -> filtered entirely
      Seq((0L * day, "c", 0.0), (1L * day, "c", 0.0), (2L * day, "c", 0.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.tailIndex(events, k = 2).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_top"), x.getAs[Long]("x_ref_cents"),
          x.getAs[Double]("sum_log_excess"), x.getAs[Double]("alpha")))).toMap
    assert(r.keySet === Set("a"))
    assert(r("a") === ((2L, 200L, 2.079441, 0.961797)))
  }

  test("eventsTwap: gap-weighted mean; last event excluded; same-instant ties pinned by event_id; zero-span users drop") {
    val sec = 1000L * 1000 * 1000
    val events = Seq(
      // user 1: 1.00 held 10s, 2.00 held 20s -> (1000 + 4000)/3000
      (0L, 0L * sec, 1L, "view", 1.0, "{}"),
      (1L, 10L * sec, 1L, "view", 2.0, "{}"),
      (2L, 30L * sec, 1L, "view", 5.0, "{}"),
      // user 2: single event -> no forward gap -> no row
      (3L, 0L * sec, 2L, "view", 9.0, "{}"),
      // user 3: two same-instant events -> zero span -> no row
      (4L, 5L * sec, 3L, "view", 1.0, "{}"),
      (5L, 5L * sec, 3L, "view", 2.0, "{}"),
      // user 4: same-instant pair then a later event — event_id order
      // gives the 3.00 the whole 10s window (the 1.00 holds 0s)
      (6L, 0L * sec, 4L, "view", 1.0, "{}"),
      (7L, 0L * sec, 4L, "view", 3.0, "{}"),
      (8L, 10L * sec, 4L, "view", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.eventsTwap(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("n_intervals"), x.getAs[Long]("total_gap_s"),
          x.getAs[Double]("twap")))).toMap
    assert(r.keySet === Set(1L, 4L))
    assert(r(1L) === ((2L, 30L, 1.666667)))
    assert(r(4L) === ((2L, 10L, 3.0)))
  }

  test("kAnonLadder: min-k is monotone up the ladder and the FIRST releasing level is chosen") {
    val sec = 1000L * 1000 * 1000
    // activity buckets (n_ev div 10): five 0s, six 1s, one 2 — the
    // singleton class only merges away two levels up
    val rows =
      (0 until 5).flatMap(u => (0 until 5).map(e => (u.toLong, e))) ++
      (10 until 16).flatMap(u => (0 until 10).map(e => (u.toLong, e))) ++
      (20 until 21).flatMap(u => (0 until 20).map(e => (u.toLong, e)))
    val events = rows.zipWithIndex.map { case ((u, e), i) =>
      (i.toLong, e.toLong * sec, u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RelationalOps.kAnonLadder(events).collect()
      .map(x => x.getAs[Long]("level") ->
        ((x.getAs[Long]("n_classes"), x.getAs[Long]("min_k"),
          x.getAs[Long]("n_below"), x.getAs[Boolean]("released"),
          x.getAs[Boolean]("chosen")))).toMap
    assert(r(0L) === ((3L, 1L, 1L, false, false))) // act classes {0:5, 1:6, 2:1}
    assert(r(1L) === ((2L, 1L, 1L, false, false))) // {0,1}->0 merges; 2->1 still alone
    assert(r(2L) === ((1L, 12L, 0L, true, true)))  // first clearing level is chosen
    assert(r(3L) === ((1L, 12L, 0L, true, false)))
    assert(r(4L) === ((1L, 12L, 0L, true, false)))
  }

  test("dpQuantile: exponential-mechanism draw replayed independently; degenerate census releases itself") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows =
      (1L to 5L).map(v => (v * day, "a", v.toDouble)) ++ // ranks 1..5, median 3.00
      Seq((0L * day, "b", 7.0), (1L * day, "b", 7.0))    // one census row: d2 = 0
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.dpQuantile(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("med_x2"),
          x.getAs[Long]("dp_med_cents"), x.getAs[Long]("dp_rank_dist2")))).toMap
    // independent replay of the mechanism for type 'a': census values
    // 100..500 at ranks 1..5, doubled distances |2i - 6|, micro weights
    val cents = Seq(100L, 200L, 300L, 400L, 500L)
    val wts = Seq(4L, 2L, 0L, 2L, 4L)
      .map(d2 => math.round(math.exp(-0.25 * d2) * 1000000.0))
    val cums = wts.scanLeft(0L)(_ + _).tail
    val u = (graft.functions.PortableHash.hash48Jvm("dpq:a") + 0.5) / 281474976710656.0
    val thr = u * cums.last.toDouble
    val pickIdx = cums.indexWhere(_.toDouble >= thr)
    assert(r("a")._1 === 5L && r("a")._2 === 600L)
    assert(r("a")._3 === cents(pickIdx), "the engine draw equals the replayed inverse-CDF pick")
    assert(r("a")._4 === Seq(4L, 2L, 0L, 2L, 4L)(pickIdx))
    // a single-value census has all the mass at d2 = 0: released as-is
    assert(r("b") === ((2L, 1400L, 700L, 0L)))
  }

  test("eventsHurst: a linear ramp is persistent (H near 1), an alternator scores exactly 0") {
    val day = 86400L * 1000 * 1000 * 1000
    // 16 days from day 0: four complete 4-blocks, two complete 8-blocks
    val rows =
      (0L until 16L).map(d => (d * day, "trend", d.toDouble)) ++
      (0L until 16L).map(d => (d * day, "alt", if (d % 2 == 0) 0.0 else 10.0))
    val events = rows.zipWithIndex
      .map { case ((ts, t, v), i) => (i.toLong, 1L, ts, t, v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = RelationalOps.eventsHurst(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_blocks_4"), x.getAs[Double]("rs_4"),
          x.getAs[Long]("n_blocks_8"), x.getAs[Double]("rs_8"),
          x.getAs[Double]("hurst")))).toMap
    // linear block: R*w = 8 (w=4) / 64 (w=8), D = 80 / 2688 exactly
    assert(r("trend") === ((4L, 1.788854, 2L, 3.491486, 0.964805)))
    // the alternator's R/S is scale-free at exactly 1.0 -> H = 0
    assert(r("alt") === ((4L, 1.0, 2L, 1.0, 0.0)))
  }
}
