package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Analytics
  import graft.sources.Tables

  lazy val li = Tables.lineitem(spark, sfDir)
  lazy val events = Tables.events(spark, sfDir)

  test("q89 co-purchase: ranks dense per part, symmetric counts, confidence bounded") {
    import org.apache.spark.sql.functions._
    val out = Analytics.copurchaseTopK(li, k = 5).localCheckpoint(true)
    assert(out.count() > 0)
    // ranks are 1..min(5, candidates), dense and unique per part
    val badRank = out.groupBy(col("part"))
      .agg(countDistinct(col("rank")).as("dr"), max(col("rank")).as("mx"),
        count(lit(1)).as("n"))
      .filter(col("dr") =!= col("n") || col("mx") =!= col("n") || col("mx") > 5)
    assert(badRank.count() == 0)
    // co-counts are symmetric: n_co(a, b) == n_co(b, a) wherever both
    // directions survive the top-k cut
    val sym = out.select(col("part").as("a"), col("other").as("b"), col("n_co"))
      .join(out.select(col("part").as("b"), col("other").as("a"), col("n_co").as("n2")),
        Seq("a", "b"))
      .filter(col("n_co") =!= col("n2"))
    assert(sym.count() == 0)
    // confidence = P(other | part) in myriad: within (0, 10000]
    assert(out.filter(col("conf_myriad") <= 0 || col("conf_myriad") > 10000).count() == 0)
    // hand basket: parts 1,2 co-occur twice, 1,3 once -> 2 outranks 3
    import spark.implicits._
    val hand = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val h = Analytics.copurchaseTopK(hand, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(h((1L, 1L)) == ((2L, 2L, 10000L)), s"part 1 rank 1: ${h((1L, 1L))}")
    assert(h((1L, 2L)) == ((3L, 1L, 5000L)), s"part 1 rank 2: ${h((1L, 2L))}")
    assertSameRows(out, Analytics.copurchaseTopK(li.repartition(13), k = 5))
  }

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

  test("q15 and q15b agree at the exactly-gap-length boundary (both merge)") {
    import spark.implicits._
    // pins the semantics the oracles encode: an event at EXACTLY
    // prev+gap merges into the running session under BOTH the lag
    // formulation ('>' gap test) and the native session_window
    // (verified here — it is inclusive at the boundary, not
    // half-open); one microsecond past the gap splits under both.
    def ev(secondTs: String) = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1.0, "c", "{}"),
      (1L, java.sql.Timestamp.valueOf(secondTs), 2L, 1.0, "c", "{}"))
      .toDF("user_id", "ts", "event_id", "value", "event_type", "props")
    val atGap = ev("2024-01-01 00:30:00")
    assert(Analytics.sessionize(atGap).count() == 1)
    assert(Analytics.sessionizeSW(atGap).count() == 1)
    val pastGap = ev("2024-01-01 00:30:00.000001")
    assert(Analytics.sessionize(pastGap).count() == 2)
    assert(Analytics.sessionizeSW(pastGap).count() == 2)
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

  test("q44 binned range join equals the naive non-equi join, without its plan") {
    val w = 300L * 1000000L
    val binned = Analytics.rangeJoinBursts(events)
    // ground truth: state the range predicate directly (BNLJ — fine at
    // test scale, the exact plan the binned form exists to avoid)
    val e = events.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val f = events.select(col("event_id").as("fid"), unix_micros(col("ts")).as("fus"))
    val naive = e.join(f, col("fus") > col("us") && col("fus") <= col("us") + w, "left")
      .groupBy(col("event_id")).agg(count(col("fid")).as("n_follow"))
    assertSameRows(binned, naive)
    // non-vacuous: bursts exist, and so do followerless errors
    assert(binned.filter(col("n_follow") > 0).count() > 0)
    // the binned PLAN has no nested-loop/cartesian — the point of the op
    binned.collect()
    val s = binned.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"), s)
  }

  test("q44 stays exact across the epoch boundary (negative timestamps)") {
    import spark.implicits._
    val w = 300L * 1000000L
    // events straddling t=0: with truncating `div`, bin 0 spans
    // (−mw, mw) — double width — and an error with lo == hi counts
    // bin-0 followers twice on the s=1 path. Floor-binning keeps it
    // exact; both paths asserted against the naive join.
    val ev = (0 until 800).map { i =>
      val us = -w + (i.toLong * 773123L) % (2 * w) // dense around 0
      (i.toLong, us, if (i % 7 == 0) "error" else "view")
    }.toDF("event_id", "us", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val f = ev.select(col("event_id").as("fid"), unix_micros(col("ts")).as("fus"))
    val naive = e.join(f, col("fus") > col("us") && col("fus") <= col("us") + w, "left")
      .groupBy(col("event_id")).agg(count(col("fid")).as("n_follow"))
    // the tiny corpus selects the s=1 window-wide path automatically
    assertSameRows(Analytics.rangeJoinBursts(ev), naive)
    // and the forced micro-bin path must agree too
    assertSameRows(Analytics.rangeJoinBursts(ev, subBins = 13), naive)
    // non-vacuous: pre-epoch errors with followers exist
    assert(naive.filter(col("event_id") % 7 === 0 && col("n_follow") > 0).count() > 0)
  }

  test("sizing caches key on data location, not canonicalized shape (r6 burst regression)") {
    // THE TRAP: same-schema reads of two different directories
    // canonicalize to byte-identical plan text — a sizing cache keyed
    // on that text returns the first dataset's stats for every
    // same-shaped dataset in the session. That handed r6's BenchScale
    // burst corpus the window-wide q44 plan sized for the uniform
    // corpus (work exponent ~2.0 instead of the micro-bin ~1.4).
    val a = spark.read.parquet(s"$sfDir/events.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    assert(a.queryExecution.analyzed.canonicalized.toString ==
      b.queryExecution.analyzed.canonicalized.toString)
    // SizingKey separates them...
    assert(graft.operators.SizingKey(a) != graft.operators.SizingKey(b))
    // ...while staying stable across repeated reads of the same dir,
    // so the cache still serves its purpose
    assert(graft.operators.SizingKey(a) ==
      graft.operators.SizingKey(spark.read.parquet(s"$sfDir/events.parquet")))
    // and distinct plans over the same files stay distinct
    assert(graft.operators.SizingKey(a.select(col("event_id"))) !=
      graft.operators.SizingKey(a.select(col("user_id"))))
  }

  test("q44 stays exact on a one-bin burst (the shape the micro-bins exist for)") {
    import spark.implicits._
    val w = 300L * 1000000L
    // 3000 events crammed into ONE 300-second window (every follower of
    // every error), deterministic µs jitter, 10% errors — the r4
    // verdict's adversarial shape where window-wide bins went Θ(B²)
    val base = 1700000000000000L - (1700000000000000L % w) // bin-aligned
    val burst = (0 until 3000).map { i =>
      val us = base + (i.toLong * 99991L) % w // dense, irregular, in-bin
      (i.toLong, us, if (i % 10 == 0) "error" else "view")
    }.toDF("event_id", "us", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    val e = burst.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val f = burst.select(col("event_id").as("fid"), unix_micros(col("ts")).as("fus"))
    val naive = e.join(f, col("fus") > col("us") && col("fus") <= col("us") + w, "left")
      .groupBy(col("event_id")).agg(count(col("fid")).as("n_follow"))
    // the MICRO-BIN path, forced (subBins): this corpus is small enough
    // that auto-sizing's uniform fallback would pick window-wide bins —
    // the r6 fallback bounds worst-case probe volume by 2·maxOcc·nErr,
    // and 2·3000·300 fits the budget — so pin the decomposition
    // explicitly to keep it covered
    val micro = Analytics.rangeJoinBursts(burst, subBins = 78)
    assertSameRows(micro, naive)
    // and the AUTO path (fallback selected here) must be exact too
    val got = Analytics.rangeJoinBursts(burst)
    assertSameRows(got, naive)
    // the burst is real: errors see hundreds-to-thousands of followers
    assert(got.agg(max(col("n_follow"))).head().getLong(0) > 1000)
  }
}
