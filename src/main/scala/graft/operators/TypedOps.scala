package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.sources.Models.LineItem

/** Typed Dataset path (SURVEY.md §3): the same per-sku stats as
  * CoreOps.productStats, but through case-class rows and a custom
  * `Aggregator` — compile-time field checks end-to-end, for pipelines
  * where the schema is fixed and refactoring safety matters more than
  * dynamic columns. The Aggregator's reduce/merge must form a
  * commutative monoid (order-independent), which is why quantity
  * accumulates in BigDecimal and orders in a Set — same invariants the
  * untyped plan gets from DECIMAL sums and countDistinct.
  */
object TypedOps {

  case class SkuStatsRow(l_partkey: Long, quantity: Double, orders: Long)

  /** (quantity sum, distinct orderkeys) accumulator. */
  case class StatsBuf(quantity: BigDecimal, orders: Set[Long])

  val productStatsAgg: Aggregator[LineItem, StatsBuf, (Double, Long)] =
    new Aggregator[LineItem, StatsBuf, (Double, Long)] {
      override def zero: StatsBuf = StatsBuf(BigDecimal(0), Set.empty)
      override def reduce(b: StatsBuf, li: LineItem): StatsBuf =
        StatsBuf(b.quantity + BigDecimal(li.l_quantity), b.orders + li.l_orderkey)
      override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
        StatsBuf(a.quantity + b.quantity, a.orders ++ b.orders)
      override def finish(b: StatsBuf): (Double, Long) =
        (b.quantity.toDouble, b.orders.size.toLong)
      override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
      override def outputEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    }

  /** Typed equivalent of CoreOps.productStats (q07). */
  def productStatsTyped(lineitem: Dataset[LineItem]): Dataset[SkuStatsRow] = {
    import lineitem.sparkSession.implicits._
    lineitem
      .groupByKey(_.l_partkey)
      .agg(productStatsAgg.toColumn)
      .map { case (k, (q, o)) => SkuStatsRow(k, q, o) }
  }

  case class OrderHeader(o_orderkey: Long, o_totalprice: Double)
  case class OrderRecon(o_orderkey: Long, has_header: Boolean, n_items: Long,
                        header_total: Double, items_total: Double)

  /** Cogrouped order/line-item reconciliation — the typed `cogroup`
    * API: both sides hash to the same key partitioning, then each
    * order's header(s) and items stream through one closure together.
    * The relational equivalent is a full-outer join + groupBy; cogroup
    * does it in ONE co-partitioned pass with no intermediate join row
    * explosion, which is what you want when the per-key logic is
    * genuinely imperative (validation, conflict resolution).
    */
  def reconcileOrders(orders: Dataset[OrderHeader],
                      items: Dataset[LineItem]): Dataset[OrderRecon] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.o_orderkey)
      .cogroup(items.groupByKey(_.l_orderkey)) { (key, hs, is) =>
        val headers = hs.toSeq
        var n = 0L
        var total = BigDecimal(0)
        is.foreach { it => n += 1; total += BigDecimal(it.l_extendedprice) }
        Iterator.single(OrderRecon(key, headers.nonEmpty, n,
          headers.headOption.map(_.o_totalprice).getOrElse(0.0),
          total.toDouble))
      }
  }
}
