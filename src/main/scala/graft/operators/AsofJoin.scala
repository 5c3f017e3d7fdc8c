package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q34: as-of (point-in-time) join — enrich each event with the most
  * recent order the same user placed at or before the event time. This
  * is the temporal semantics a Kafka Streams KTable join gives for
  * free (the table holds "the latest value as of now", Streams.java:137)
  * and the join training-data pipelines use for leakage-free feature
  * attachment.
  *
  * Spark has no as-of join operator; the scalable composition is the
  * union-and-window sweep: tag both sides, union, sort per key by
  * (time, side) so a quote at t==query-time precedes the query
  * (inclusive as-of), then `last(value, ignoreNulls)` over the
  * unbounded-preceding frame carries the latest quote forward into
  * each query row. ONE shuffle on the join key + a per-key sort —
  * the same cost envelope as any windowed op, no range-explosion,
  * skew-bounded by the key distribution.
  */
object AsofJoin {

  /** (events ⋈asof orders): one output row per event with the latest
    * (o_orderdate ≤ ts) order's key and date; null where the user has
    * no prior order. Quotes are pre-deduplicated per (user, date) with
    * max(o_orderkey) so ties are deterministic.
    */
  def eventsAsofOrders(events: DataFrame, orders: DataFrame): DataFrame = {
    val quotes = orders
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .select(col("user_id"), col("o_orderdate").as("t"),
        lit(0).as("side"), lit(null).cast("long").as("event_id"),
        col("last_orderkey"), col("o_orderdate"))
    val queries = events
      .select(col("user_id"), col("ts").as("t"),
        lit(1).as("side"), col("event_id"),
        lit(null).cast("long").as("last_orderkey"),
        lit(null).cast("timestamp").as("o_orderdate"))

    // side=0 (quote) sorts before side=1 (query) at equal t → inclusive
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("last_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    quotes.unionAll(queries)
      .withColumn("asof_key", last(col("last_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_date", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("asof_key").as("last_orderkey"),
        date_format(col("asof_date"), "yyyy-MM-dd").as("last_orderdate"))
  }
}
