package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Analytics
  import graft.sources.Tables

  lazy val li = Tables.lineitem(spark, sfDir)
  lazy val events = Tables.events(spark, sfDir)

  test("q11 pricing summary groups cover all rows") {
    val out = Analytics.pricingSummary(li).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("count_order")).sum
    val expected = li.filter(col("l_shipdate") <=
      lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00"))).count()
    assert(total == expected)
  }

  test("q12 top-k is deterministic and sorted") {
    val rows = Analytics.topUnshipped(Tables.customer(spark, sfDir),
      Tables.orders(spark, sfDir), li).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q14 running window: ship_seq within supplier is 1..n and qty monotone") {
    val out = Analytics.windowRunning(li)
    val bad = out.groupBy("l_suppkey")
      .agg(min("ship_seq").as("mn"), max("ship_seq").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("q15b session_window formulation agrees with the lag/cumsum one") {
    val ev = Tables.events(spark, sfDir)
    val a = Analytics.sessionize(ev)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    val b = Analytics.sessionizeSW(ev)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    SparkTestSession.assertSameRows(a, b)
  }

  test("q15 sessions partition all events") {
    val out = Analytics.sessionize(events)
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events.count())
  }

  test("q16 window agg counts cover all events") {
    val out = Analytics.eventsWindowAgg(events)
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events.count())
  }

  test("q11 plan: filter and projection pushed into parquet scan") {
    val plan = Analytics.pricingSummary(li).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
  }
}
