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
}
