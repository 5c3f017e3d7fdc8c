package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core operators re-expressing the reference Kafka Streams topology
  * (reference: streams/src/main/java/dev/buesing/ksd/streams/Streams.java:99-266)
  * as declarative Spark plans.
  *
  * Scale notes (100 TB): every join here either broadcasts a small dim
  * or shuffles once on the natural key; group-bys that follow a join on
  * the same key reuse the exchange (Catalyst's EnsureRequirements sees
  * the child partitioning). Money math is done in DECIMAL(30,6) so
  * results are exact and order-independent — a requirement for
  * distributed re-aggregation to be deterministic.
  */
object CoreOps {

  /** Cast a (double) money/quantity expression to exact decimal before
    * summing: double sums are order-dependent; decimal sums are exact, so
    * any partitioning/AQE re-plan yields bit-identical results.
    */
  def dec(c: Column): Column = c.cast(DecimalType(30, 6))

  /** Exact sum of a double column, emitted back as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** q01: selectKey / key-changing repartition
    * (Streams.java:136 `.selectKey((k,v) -> v.getUserId())`).
    * In Spark a key change is `repartition(col)` — an explicit hash
    * exchange on the new key, the moral equivalent of Kafka Streams'
    * internal repartition topic. Downstream per-key ops then run
    * co-partitioned without further shuffles.
    */
  def repartitionByKey(orders: DataFrame): DataFrame =
    orders
      .repartition(col("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** q02: stream ⋈ KTable equi-join (Streams.java:137 join users).
    * Both sides are large at scale → single shuffle on the key; AQE may
    * downgrade to broadcast when the dim is small at runtime.
    */
  def joinUser(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"))

  /** q03: stream ⋈ GlobalKTable (Streams.java:141 join stores).
    * A GlobalKTable is replicated to every instance — Spark's exact
    * analog is a broadcast join: no shuffle of the big side at all.
    */
  def joinStoreBroadcast(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))

  /** q04: flatMap explode — one record per line item keyed by sku
    * (Streams.java:145). Round-trips lineitem through the nested
    * PurchaseOrder shape (collect_list per order) and back out with
    * `explode`, proving both directions. At scale the nested form only
    * exists inside one stage — no wide shuffle of arrays beyond the
    * single groupBy exchange.
    */
  def explodeItems(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(collect_list(struct(col("l_partkey"), col("l_linenumber"), col("l_quantity"))).as("items"))
      .select(col("l_orderkey"), explode(col("items")).as("item"))
      .select(col("l_orderkey"), col("item.l_partkey").as("l_partkey"),
        col("item.l_linenumber").as("l_linenumber"), col("item.l_quantity").as("l_quantity"))

  /** q05: KTable price-enrichment join (Streams.java:147 join products,
    * setting item price from the product table).
    */
  def enrichPrice(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("p_retailprice").as("price"))

  /** q06: groupBy(orderId) + reduce + filter(all items priced)
    * (Streams.java:152-169 "pickup-order-reduce"). The reference merges
    * per-sku-priced copies of the order back into one and emits it only
    * when every item has a price; here that is a left join (missing part
    * → null price) + grouped agg + `bool_and` filter. Join and groupBy
    * share the l_orderkey key → one shuffle total on the fact side.
    */
  def orderReassembly(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"), "left")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("item_count"),
        dsum(col("l_quantity") * col("p_retailprice")).as("order_total"),
        expr("bool_and(p_retailprice IS NOT NULL)").as("all_priced"))
      .filter(col("all_priced"))
      .select(col("l_orderkey"), col("item_count"), col("order_total"))

  /** q07: groupByKey(sku) + aggregate → ProductStats
    * (Streams.java:174-220; ProductStatsV2.add in
    * common/src/main/java/dev/buesing/ksd/common/domain/ProductStatsV2.java:30-45:
    * quantity += qty, orders += 1 per order touching the sku).
    */
  def productStats(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_partkey"))
      .agg(
        dsum(col("l_quantity")).as("quantity"),
        countDistinct(col("l_orderkey")).as("orders"))

  /** q08: ProductStats.quantityByStore — per-(sku, store) quantity
    * (ProductStatsV1.java quantityByStore list / ProductStatsV2 map).
    * The map-valued column is modeled relationally as one row per
    * (partkey, suppkey): flat, shuffle-friendly, and skew-proof at scale
    * (a map column would concentrate a hot sku's whole fan-in on one row).
    */
  def statsByStore(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("quantity"))

  /** q09: V1→V2 stats restore/merge (Streams.java:222-259 restore
    * transformer; ProductStatsV2.merge). Two disjoint partial aggregates
    * (old-version state + new traffic) merge by re-aggregation — the
    * union-then-agg plan is exactly Kafka Streams' state-store merge,
    * but expressed so Spark does it with map-side partials.
    */
  def statsMerge(lineitem: DataFrame): DataFrame = {
    def half(p: Column => Column): DataFrame =
      lineitem.filter(p(col("l_orderkey")))
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("q"), countDistinct(col("l_orderkey")).as("o"))
    val v1 = half(k => k % 2 === 0)
    val v2 = half(k => k % 2 =!= 0)
    v1.unionAll(v2)
      .groupBy(col("l_partkey"))
      .agg(sum(col("q")).cast("double").as("quantity"), sum(col("o")).as("orders"))
  }

  /** Skew-resistant two-phase aggregation: partial-aggregate on
    * (key, salt) — spreading a hot key over `salts` reducers — then
    * final-aggregate on key. Correct for any decomposable aggregate
    * (sums/counts here). Use when ONE key dominates (a viral sku, a
    * null-heavy join key) and AQE's skew handling can't help because
    * the skew is in an aggregation, not a join. Costs one extra (tiny)
    * shuffle of `salts`×|keys| partial rows — at uniform data it's
    * pure overhead, so it's an explicit opt-in, not the default.
    * countDistinct stays exact because the salt is a FUNCTION OF the
    * counted column (each orderkey lands in exactly one salt bucket).
    */
  def saltedProductStats(lineitem: DataFrame, salts: Int = 16): DataFrame =
    lineitem
      .groupBy(col("l_partkey"), pmod(xxhash64(col("l_orderkey")), lit(salts.toLong)).as("salt"))
      .agg(sum(dec(col("l_quantity"))).as("q"),
        countDistinct(col("l_orderkey")).as("o"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("q")).cast("double").as("quantity"), sum(col("o")).as("orders"))

  /** q10 / flagship: the full topology end-to-end (Streams.java:99-169):
    * rekey by user → join users → broadcast-join stores → explode items
    * → enrich prices → reassemble order → filter fully-priced.
    *
    * Plan shape, deliberately: REDUCE FIRST, ENRICH AFTER. The item
    * fan-in (groupBy l_orderkey) runs before any dimension join, so
    * (a) the lineitem⋈orders join and the aggregation share the
    * orderkey exchange, and (b) only one pre-aggregated row per order —
    * not every line item — flows through the customer/nation joins.
    * Grouping after the joins on (orderkey, c_name, n_name) would
    * re-shuffle the full enriched item stream on a 3-column key.
    */
  def pickupPipeline(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                     lineitem: DataFrame, part: DataFrame): DataFrame =
    orderReassembly(lineitem, part)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"), col("c_name"), col("n_name"),
        col("item_count"), col("order_total"))
}
