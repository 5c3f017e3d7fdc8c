package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON value serde for Kafka-shaped frames — the reference serializes
  * every domain object as JSON on the wire (the Jackson serde under
  * common/src/main/java/dev/buesing/ksd/common/domain). The Spark
  * analog: `from_json` with an explicit schema on the Kafka `value`
  * column, `to_json` on the way out. Schemas are declared, never
  * inferred — inference would scan the stream and lock in whatever the
  * first batch happened to contain.
  */
object Serde {

  /** Purchase-order wire schema (reference PurchaseOrder.java:
    * orderId, userId, storeId, items[sku, quantity, price]).
    */
  val orderSchema: StructType = new StructType()
    .add("order_id", LongType)
    .add("user_id", LongType)
    .add("store_id", LongType)
    .add("items", ArrayType(new StructType()
      .add("sku", LongType)
      .add("quantity", LongType)
      // containsNull = true, honestly: from_json forces its schema
      // nullable (asNullable), so a payload like {"items":[null]}
      // parses to an array CONTAINING null — declaring false here
      // would promise an invariant nothing enforces
      .add("price", DoubleType), containsNull = true))

  /** Parse a Kafka-shaped frame (binary `key`/`value` columns — what
    * KafkaIO.reader().load() yields) into typed order rows. Rows that
    * fail to parse surface as nulls (PERMISSIVE), never kill the
    * stream — the reference's deserialization-error-handler choice.
    */
  def parseOrders(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame
      .select(col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), orderSchema).as("order"))
      .select(col("key"), col("order.order_id").as("order_id"),
        col("order.user_id").as("user_id"), col("order.store_id").as("store_id"),
        col("order.items").as("items"))

  /** Encode order rows back to a Kafka-writable frame: key = order_id
    * (the partitioning key — key choice IS the repartitioning decision,
    * Streams.java:136), value = JSON.
    */
  def encodeOrders(orders: DataFrame): DataFrame =
    orders.select(
      col("order_id").cast("string").as("key"),
      to_json(struct(col("order_id"), col("user_id"), col("store_id"),
        col("items"))).as("value"))
}
