package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic purchase-order generator — the reference's
  * `publisher` module (publisher/src/main/java/dev/buesing/ksd/
  * publisher/Producer.java: random orders with a user from the user
  * pool, a store, and 1..N line items of sku/quantity). Instead of RNG
  * state, every field is a hash of the order id: the same id always
  * yields the same order, on any executor, in batch (`spark.range`) or
  * streaming (`rate` source / Kafka offsets) — which is what makes
  * replays and exactly-once retries idempotent.
  */
object OrderGenerator {

  /** Expand a frame with an `id` column (spark.range, rate-source
    * `value`, Kafka offset…) into deterministic nested orders:
    * (order_id, user_id, store_id, items[sku, quantity]).
    */
  def orders(ids: DataFrame, nUsers: Int = 1000, nStores: Int = 100,
             nSkus: Int = 5000, maxItems: Int = 5): DataFrame =
    // hash the CANONICAL long id, never the raw column: xxhash64
    // hashes a 4-byte INT and an 8-byte BIGINT differently, so without
    // the cast the same id value generates different orders depending
    // on the source column's integer width — breaking the replay
    // determinism the generator exists for
    ids.select(col("id").cast("long").as("id")).select(
      col("id").as("order_id"),
      pmod(xxhash64(col("id"), lit("user")), lit(nUsers.toLong)).as("user_id"),
      pmod(xxhash64(col("id"), lit("store")), lit(nStores.toLong)).as("store_id"),
      expr(
        s"""transform(sequence(1, CAST(1 + pmod(xxhash64(id, 'n_items'), $maxItems) AS INT)),
            i -> struct(
              pmod(xxhash64(id, 'sku', i), ${nSkus}L) AS sku,
              CAST(1 + pmod(xxhash64(id, 'qty', i), 10) AS BIGINT) AS quantity))""")
        .as("items"))

  /** The exploded (repartition-ready) item view — one row per line
    * item keyed by sku, the shape the reference's flatMap emits
    * (Streams.java:145).
    */
  def orderItems(ids: DataFrame, nUsers: Int = 1000, nStores: Int = 100,
                 nSkus: Int = 5000, maxItems: Int = 5): DataFrame =
    orders(ids, nUsers, nStores, nSkus, maxItems)
      .select(col("order_id"), col("user_id"), col("store_id"),
        explode(col("items")).as("item"))
      .select(col("order_id"), col("user_id"), col("store_id"),
        col("item.sku").as("sku"), col("item.quantity").as("quantity"))
}
