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
}
