package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import CoreOps.{dec, dsum}

/** Analytics headliners — the batch "query capability" surface the
  * reference's topology implies (grouped aggregation, multi-way joins,
  * top-k, windows, sessionization), sized for a 100 TB cluster:
  * single-shuffle aggs with map-side partials, broadcast dims, and
  * window partitioning on high-cardinality keys.
  */
object Analytics {

  /** (maxOcc, nErr) sizing stats for rangeJoinBursts, cached per
    * (session, SizingKey, window) — the nCache pattern
    * (Similarity.approxCount): repeated invocations of the same query
    * don't each pay the sizing job. The key MUST carry the leaf file
    * paths (SizingKey), not just the canonicalized plan: same-schema
    * reads of different directories canonicalize identically, and a
    * collision here hands a burst corpus the window-wide plan sized
    * for a uniform one — exact but Θ(B²), the precise failure the
    * micro-bin path exists to prevent (caught by BenchScale r6).
    * Staleness after an in-place file change is harmless to
    * CORRECTNESS by construction: the stat only selects between two
    * exact plans (window-wide vs micro-bin), never changes the answer.
    */
  private val occCache = new SessionCache[(Long, Long)]
  private def occStats(ev: DataFrame, w: Long): (Long, Long) =
    occCache.getOrCompute(ev.sparkSession, s"w=$w#" + SizingKey(ev)) {
      val r = ev.groupBy(expr(s"us div $w"))
        .agg(count(lit(1)).as("c"),
          count_if(col("event_type") === "error").as("e"))
        .agg(max(col("c")), sum(col("e"))).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }

  /** q11: TPC-H Q1-style pricing summary. Pure scan→partial-agg→final:
    * at scale this is bound by parquet scan throughput; the projection
    * and shipdate filter are pushed into the scan.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** q12: TPC-H Q3-style shipping priority: selective filters pushed to
    * both scans, two shuffle joins on their natural keys, then a grouped
    * agg + deterministic top-k.
    */
  def topUnshipped(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00"))
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(lineitem.filter(col("l_shipdate") > cutoff), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
  }

  /** q13: TPC-H Q5-style regional revenue: big facts shuffle-join on
    * their keys; nation/region ride along as broadcasts. supplier stands
    * in for the store dimension (reference joins orders→store,
    * Streams.java:141).
    */
  def regionalRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** q14: window functions — per-supplier ship sequence + running
    * quantity. Window partition key (l_suppkey) is high-cardinality at
    * scale so the sort stays per-partition and parallel.
    */
  def windowRunning(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    lineitem
      .withColumn("ship_seq", row_number().over(w))
      .withColumn("running_qty",
        sum(dec(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter(col("ship_seq") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("ship_seq"), col("running_qty"))
  }

  /** q17: order-priority counts over a semi-join (TPC-H Q4 shape) —
    * EXISTS rewritten as `left_semi`: the probe side never widens, no
    * data from lineitem crosses the join, and the build side is only
    * the filtered keys. The cheapest of the join family at scale.
    */
  def orderPriorityCount(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** q18: large-order detection (TPC-H Q18 shape) — aggregate lineitem
    * once, filter on the aggregate (HAVING), then join the survivors
    * back to orders. The post-HAVING set is small, so the join back is
    * broadcast-able; the big table is scanned exactly once.
    */
  def largeOrders(orders: DataFrame, lineitem: DataFrame, minQty: Double = 150.0): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("total_qty"))

  /** q19: customers with no recent orders — NOT EXISTS as `left_anti`.
    * Same scale story as q17: nothing widens, only filtered keys build.
    */
  def inactiveCustomers(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** q15: gap-based sessionization of the events stream (30-minute
    * inactivity gap) via lag + cumulative-sum windows — the classic
    * two-window formulation that needs exactly one shuffle on user_id.
    */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).cast("double") / 1e6 > 1800.0,
          1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        dsum(col("value")).as("session_value"))
  }

  /** q15b (rows-only): the same 30-minute-gap sessionization via
    * Spark's native `session_window` — one groupBy, no window
    * functions, and the identical plan works under Structured
    * Streaming with a watermark. Cross-validated against the
    * lag/cumsum formulation (q15) in AnalyticsSpec; kept alongside it
    * because session_window can't emit the per-user ordinal
    * session_seq the reference-style output carries.
    */
  def sessionizeSW(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("session_value"))

  /** q35: semi-structured extraction — pull a typed field out of the
    * JSON `props` payload and aggregate on it. `get_json_object` is the
    * scan-time path (no pre-parse materialization); for hot multi-field
    * access, `from_json` with an explicit schema (graft.sources.Serde
    * pattern) amortizes one parse per row.
    */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_missing"))

  /** q16: tumbling event-time window aggregation — the batch analog of
    * the Structured Streaming job in graft.streaming (watermark+window);
    * same plan shape: bucket timestamp, partial agg, one shuffle.
    */
  def eventsWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** q44: RANGE JOIN with no equi key — for every error event, count
    * events strictly inside the following `windowSec` seconds (burst
    * correlation: "what cascades after an error"). A naive
    * `f.ts > e.ts AND f.ts <= e.ts + w` join has no equi conjunct, so
    * Spark plans BroadcastNestedLoopJoin — one task owning |err|×|all|
    * predicate evaluations and a broadcast ceiling. The standard fix
    * Spark lacks natively is INTERVAL BINNING — but the r4 version's
    * window-wide bins had a quadratic failure mode on exactly the data
    * shape this operator targets: a burst of B events inside one bin
    * makes that bin's candidate product |err_bin|·B, i.e. Θ(B²) for a
    * burst of errors, and AQE's skew splitting only spreads that work,
    * it doesn't shrink it.
    *
    * Because n_follow is a pure COUNT, the window decomposes: split
    * time into MICRO-bins of width w/s; every micro-bin strictly
    * inside (t, t+w] contributes its PRE-AGGREGATED count (one row),
    * and only the two boundary micro-bins are probed against raw
    * events under the exact predicate. Per-error cost falls from
    * Θ(occupancy) to s + 2·occupancy/s, minimized at s ≈ √(2·occ) —
    * the auto-sizing below — so a burst of B costs Θ(B·√B) total
    * instead of Θ(B²). Integer-count decomposition is exact, so the
    * oracle (the direct range predicate) still matches cell-for-cell.
    * All bin arithmetic is integer `div` on micros — no double
    * rounding can shift a boundary.
    */
  def rangeJoinBursts(events: DataFrame, windowSec: Int = 300,
                      subBins: Int = 0): DataFrame = {
    val w = windowSec * 1000000L
    val ev = events.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("event_type"))
    // densest w-wide bin + error count → sub-bin factor (one coarse
    // count-aggregate job, cached per input plan — occStats above; the
    // collect is two longs). UNIFORM FALLBACK:
    // the decomposition exists to kill burst quadratics, but on sparse/
    // uniform data its fixed machinery (interior-bin explode, the micro
    // aggregation, a third join) costs more than it saves — so when the
    // WORST-CASE window-wide probe volume 2·maxOcc·nErr fits a fixed
    // row budget, use single window-wide bins (s = 1). The criterion is
    // burst-safe by construction: it bounds total work by the maximum
    // occupancy actually observed, so a corpus that would blow up the
    // s = 1 path can never select it — a one-bin burst of B raises
    // maxOcc (and nErr) past the budget and lands on the micro-bin
    // path, which BenchScale measures at exponent ~1.4.
    val s =
      if (subBins > 0) subBins.toLong
      else {
        val (occ, nErr) = occStats(ev, w)
        if (2.0 * occ * nErr <= 4e6) 1L
        else math.min(4096L, math.max(8L, math.ceil(math.sqrt(2.0 * occ)).toLong))
      }
    val mw = math.max(1L, w / s) // micro-bin width in µs (s = 1 ⇒ mw = w)

    // FLOOR division, not `div` (which truncates toward zero): with
    // truncation, every bin at a negative timestamp is a half-open
    // interval on the WRONG side and bin 0 spans (−mw, mw) — twice the
    // width — so for pre-epoch events (bad clocks, sentinel dates)
    // lo == hi becomes possible and the s = 1 branch would count bin-0
    // followers TWICE. Floor-binning keeps every bin [m·mw, (m+1)·mw)
    // for all m, so hi = lo + s exactly and both branches stay exact
    // on any timestamp sign (r6 review finding; negative-ts parity
    // spec in AnalyticsSpec). (us − pmod(us, mw)) is exactly divisible,
    // so the integer arithmetic is exact in both engines.
    def fdiv(e: String): String = s"(($e - pmod($e, $mw)) div $mw)"
    val binned = ev.select(col("event_id").as("fid"), col("us").as("fus"),
      expr(fdiv("us")).as("mbin"))
    val micro = binned.groupBy(col("mbin")).agg(count(lit(1)).as("cnt"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("us"),
        expr(fdiv("us")).as("lo"), expr(fdiv(s"(us + ${w}L)")).as("hi"))

    if (s == 1) {
      // window-wide bins: hi = lo+1 exactly, no interior micro-bins
      // exist (hi − lo < 2 for every error). One pass instead of
      // boundCnt + a re-join of err: LEFT join keeps errors whose two
      // bins are empty, and the conditional count applies the exact
      // predicate — so zero-follower errors emerge with n_follow = 0
      // from the same aggregation
      err.select(col("event_id"), col("us"),
          explode(array(col("lo"), col("hi"))).as("mbin"))
        .join(binned, Seq("mbin"), "left")
        .groupBy(col("event_id"))
        .agg(count(when(col("fus") > col("us") && col("fus") <= col("us") + w,
          lit(1))).as("n_follow"))
    } else {
      // micro-bins strictly inside (us, us+w]: every event in
      // [m·mw, (m+1)·mw) qualifies iff m ≥ lo+1 and m ≤ hi−1 (micro-bin
      // hi holds us+w itself but also later events; lo holds events ≤ us)
      val fullCnt = err
        .filter(col("hi") - col("lo") >= lit(2L))
        .select(col("event_id"), explode(sequence(col("lo") + 1, col("hi") - 1)).as("mbin"))
        .join(micro, Seq("mbin"))
        .groupBy(col("event_id")).agg(sum(col("cnt")).as("n_full"))

      // boundary micro-bins under the exact predicate (w is an exact
      // multiple of mw, so hi ≥ lo+1 always — no dedup needed)
      val boundCnt = err
        .select(col("event_id"), col("us"), explode(array(col("lo"), col("hi"))).as("mbin"))
        .join(binned, Seq("mbin"))
        .filter(col("fus") > col("us") && col("fus") <= col("us") + w)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_bound"))

      err.select(col("event_id"))
        .join(fullCnt, Seq("event_id"), "left")
        .join(boundCnt, Seq("event_id"), "left")
        .select(col("event_id"),
          (coalesce(col("n_full"), lit(0L)) + coalesce(col("n_bound"), lit(0L)))
            .as("n_follow"))
    }
  }

  /** q89: CO-PURCHASE top-k recommendations — the classic basket
    * analysis over the reference's own domain (the orders/lineitem
    * purchase graph q54/q55 already mine for structure): for each
    * part, the k parts most often bought in the SAME order, ranked
    * (co-count DESC, part ASC), with the association strength as
    * myriad-integer CONFIDENCE = P(b | a)·10⁴ = (n_co·10⁴) div
    * cnt_a — replayable where a float lift would drift, and
    * overflow-free by construction (n_co ≤ cnt_a ⇒ product ≤
    * cnt_a·10⁴ ≪ 2⁶³, unlike lift whose n_co·N·10⁴ crosses 2⁶³ at
    * corpus scale).
    *
    * Scale shape: the pair frame is the per-order item-set
    * self-joined on l_orderkey — baskets are small (TPC-H ~4-7
    * items), so pairs are Σ|basket|² ≈ linear in lineitem and the
    * join is skew-free by construction; co-counts are ONE (a, b)
    * aggregate with map-side partials; the per-item ranking is the
    * bounded TopKBy aggregate (k rows per item per partition,
    * map-side), never a rank window over the pair frame (the
    * popular-item partition is the straggler a window would create).
    *
    * Output: (part, rank, other, n_co, conf_myriad).
    */
  def copurchaseTopK(lineitem: DataFrame, k: Int = 5): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(true) // consumed three times: pairs×2, counts
    val cnts = items.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
    val pairs = items
      .join(items.select(col("ok"), col("part").as("other")), Seq("ok"))
      .filter(col("part") =!= col("other"))
      .groupBy(col("part"), col("other")).agg(count(lit(1)).as("n_co"))
    pairs
      .groupBy(col("part"))
      // TopKBy ranks (ord DESC, id ASC) natively == (n_co DESC,
      // other ASC); n_co ≪ 2⁵³ so the double ord is exact
      .agg(graft.functions.TopKByFunctions.top_k_by(
        col("n_co").cast("double"), col("other"), k).as("top"))
      .select(col("part"), posexplode(col("top")).as(Seq("pos", "t")))
      // n_co rides in the ord field EXACTLY (a count < 2⁵³ is exact
      // as double), so recover it by cast instead of re-joining the
      // pair frame — that join re-ran the basket self-join + pair
      // aggregate a second time for values already in hand
      .select(col("part"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("other"), col("t.ord").cast("long").as("n_co"))
      .join(cnts, Seq("part"))
      .select(col("part"), col("rank"), col("other"), col("n_co"),
        expr("n_co * 10000 div cnt").as("conf_myriad"))
  }
}
