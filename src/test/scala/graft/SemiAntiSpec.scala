package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q17–q19: semi/anti-join analytics — semantic invariants plus the
  * plan property that makes them cheap (the probe side never widens).
  */
class SemiAntiSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Analytics
  import graft.sources.Tables

  lazy val orders = Tables.orders(spark, sfDir)
  lazy val li = Tables.lineitem(spark, sfDir)
  lazy val cust = Tables.customer(spark, sfDir)

  test("q17 semi-join counts partition the qualifying orders") {
    val out = Analytics.orderPriorityCount(orders, li)
    val total = out.agg(sum("order_count")).head().getLong(0)
    val direct = orders.join(
      li.filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select("l_orderkey").distinct(),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(total == direct)
    assert(out.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }

  test("q18 join-back keeps exactly the HAVING survivors") {
    val out = Analytics.largeOrders(orders, li, minQty = 150.0)
    assert(out.filter(col("total_qty") <= 150.0).count() == 0)
    // every surviving key is a real order
    assert(out.join(orders, Seq("o_orderkey")).count() == out.count())
  }

  test("q34 as-of join: every enrichment is the max prior-dated order") {
    val ev = Tables.events(spark, sfDir)
    val out = graft.operators.AsofJoin.eventsAsofOrders(ev, orders)
    assert(out.count() == ev.count())
    // brute-force check on a sample user: latest order at/before each event
    val u = out.select("user_id").limit(1).head().getLong(0)
    val got = out.filter(col("user_id") === u)
      .select("event_id", "last_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def micros(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime * 1000L
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val userOrders = orders.filter(col("o_custkey") === u)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), micros(r.get(1))))
    val userEvents = ev.filter(col("user_id") === u)
      .select(col("event_id"), col("ts")).collect()
    for (r <- userEvents) {
      val eventMicros = micros(r.get(1))
      val eligible = userOrders.filter(_._2 <= eventMicros)
      val expect =
        if (eligible.isEmpty) -1L
        else eligible.maxBy(o => (o._2, o._1))._1
      assert(got(r.getLong(0)) == expect, s"event ${r.getLong(0)}")
    }
  }

  test("q19 anti-join: result ∩ recent-order customers is empty") {
    val out = Analytics.inactiveCustomers(cust, orders)
    val active = orders
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(out.join(active, Seq("c_custkey")).count() == 0)
    assert(out.count() + active.count() == cust.count())
    assert(out.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }
}
