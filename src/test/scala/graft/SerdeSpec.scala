package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** JSON wire serde round-trip: generated orders → encode (Kafka key/
  * value shape) → parse must reproduce the original rows, including
  * the nested item array; malformed payloads degrade to nulls.
  */
class SerdeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.{OrderGenerator, Serde}

  test("encode→parse round-trips generated orders exactly") {
    // generator emits (sku, quantity); wire schema also carries price
    val orders = OrderGenerator.orders(spark.range(0, 500).toDF("id"))
      .withColumn("items", expr(
        "transform(items, x -> struct(x.sku AS sku, x.quantity AS quantity, CAST(x.sku % 100 AS DOUBLE) AS price))"))
    val wire = Serde.encodeOrders(orders)
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = Serde.parseOrders(
      wire.select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value")))
    assertSameRows(
      back.select(col("order_id"), col("user_id"), col("store_id"),
        to_json(col("items")).as("items")),
      orders.select(col("order_id"), col("user_id"), col("store_id"),
        to_json(col("items")).as("items")))
  }

  test("malformed values parse to nulls, not failures") {
    import spark.implicits._
    val bad = Seq(("k1", "{not json"), ("k2", """{"order_id": 7}""")).toDF("key", "value")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val out = Serde.parseOrders(bad).collect()
    assert(out.length == 2)
    assert(out.exists(r => r.isNullAt(1))) // order_id null for junk
    assert(out.exists(r => !r.isNullAt(1) && r.getLong(1) == 7L))
  }
}
