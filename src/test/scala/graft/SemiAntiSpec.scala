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
