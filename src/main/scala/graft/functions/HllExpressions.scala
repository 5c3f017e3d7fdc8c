package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `hll_sketch(longCol)` — aggregates a column of 64-bit keys into a
  * serialized HLL register array (graft.functions.Hll). The OUTPUT is
  * the sketch itself, not the estimate: sketches are mergeable state,
  * which is what the reference's V1→V2 restore path moves between
  * state stores (restore/…/Restore.java replays V1 changelog records
  * into the V2 store via ProductStatsV2.merge). Batch produces
  * sketches, streaming merges them — same bytes both sides.
  */
case class HllSketchAgg(child: Expression, p: Int = 12,
                        mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(LongType)
  // p=0 shifts by 64 (a JVM no-op) and indexes out of bounds; p>=31
  // overflows 1<<p negative; p<4 has no defined alpha — fail at plan
  // time like the sibling aggregates, not mid-job on an executor
  require(p >= 4 && p <= 30, s"hll precision p=$p out of range [4, 30]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0))
}

/** `hll_estimate(sketch)` — cardinality estimate of a serialized HLL
  * sketch. Scalar, so estimates can be read at any point of the
  * sketch's life (partial, merged, restored).
  */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllFunctions {
  /** Mergeable HLL sketch of a long column (2^p byte registers). */
  def hll_sketch(c: Column, p: Int = 12): Column =
    Bridge.column(HllSketchAgg(Bridge.expression(c), p).toAggregateExpression())

  /** Distinct-count estimate of a sketch column. */
  def hll_estimate(c: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(c)))
}
