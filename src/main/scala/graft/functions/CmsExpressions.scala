package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch — the mergeable frequency sketch beside the HLL
  * cardinality sketch (HllExpressions): `depth` rows of `width`
  * counters; add() increments one counter per row (chosen by that
  * row's universal hash), estimate(x) is the min over rows — an upper
  * bound on x's true count, within εN (ε ≈ e/width) with probability
  * 1−e^−depth. Mergeable by counter-wise ADDITION, so partial sketches
  * combine exactly like partial sums: map-side partials, streaming
  * state, cross-day unions all compose.
  *
  * The row hashes draw the SQL-replayable ReplayableHash family at
  * indices 400..400+depth−1 over poly_hash keys (both < 2³¹, products
  * < 2⁶² — no overflow in either engine), so a DuckDB oracle can
  * reproduce EVERY COUNTER, and therefore every estimate, exactly —
  * an oracle-checkable sketch (q45).
  */
object Cms {
  final val HashBase = 400 // ReplayableHash index block reserved for CMS

  def rowBucket(s: Long, i: Int, width: Int): Int =
    // floorMod at both reductions: the documented domain is poly_hash
    // keys (non-negative), but the SQL surface accepts any BIGINT — a
    // negative key (e.g. xxhash64 output) under JVM `%` yields a
    // negative bucket: AIOOBE at row 0, silent aliasing into the row
    // above otherwise. floorMod is identical for non-negative keys,
    // so the oracle replay is unchanged.
    (Math.floorMod(Math.floorMod(ReplayableHash.a(HashBase + i) * Math.floorMod(s, ReplayableHash.P) +
      ReplayableHash.b(HashBase + i), ReplayableHash.P), width.toLong)).toInt

  def empty(width: Int, depth: Int): Array[Long] = new Array[Long](width * depth)

  def add(buf: Array[Long], s: Long, width: Int, depth: Int): Unit = {
    var i = 0
    while (i < depth) { buf(i * width + rowBucket(s, i, width)) += 1L; i += 1 }
  }

  def merge(into: Array[Long], from: Array[Long]): Unit = {
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def estimate(buf: Array[Long], s: Long, width: Int, depth: Int): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = buf(i * width + rowBucket(s, i, width))
      if (c < m) m = c
      i += 1
    }
    m
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** `cms_sketch(keyCol, width, depth)` — aggregate a long-key column
  * into a serialized Count-Min sketch (width·depth counters).
  */
case class CmsSketchAgg(child: Expression, width: Int = 1024, depth: Int = 4,
                        mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(LongType)


  require(width > 0 && depth > 0, "cms_sketch needs positive width/depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = Cms.empty(width, depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.add(buf, v.asInstanceOf[Long], width, depth)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    Cms.merge(buf, other); buf
  }

  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren(0))
}

/** `cms_estimate(sketch, keyCol, width, depth)` — upper-bound count of
  * the key in a serialized sketch. Scalar; width/depth must match the
  * sketch that produced the bytes (checked against the byte length).
  *
  * The deserialized counters are MEMOIZED per task: the common shape
  * is many keys probed against one sketch (q45: k rows × one 32 KiB
  * sketch), and each row's `sk` arrives as a fresh byte-array copy out
  * of its UnsafeRow, so the cache keys on CONTENT (identity fast path
  * first, then length + Arrays.equals — a read-only scan that
  * early-exits on the first differing byte). A repeated sketch costs
  * one comparison scan instead of a 32 KiB allocation + copy per row;
  * a genuinely different sketch pays one extra scan before
  * deserializing. The expression is single-threaded per task (Catalyst
  * eval contract), so plain transient fields suffice.
  */
case class CmsEstimate(left: Expression, right: Expression,
                       width: Int = 1024, depth: Int = 4)
    extends BinaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, LongType)

  override def dataType: DataType = LongType

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedCounters: Array[Long] = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    require(bytes.length == width * depth * 8,
      s"cms_estimate: sketch is ${bytes.length} bytes, expected ${width * depth * 8} " +
        s"(width=$width depth=$depth)")
    if (cachedCounters == null ||
        !((bytes eq cachedBytes) || java.util.Arrays.equals(bytes, cachedBytes))) {
      cachedCounters = Cms.deserialize(bytes)
      cachedBytes = bytes
    }
    Cms.estimate(cachedCounters, key.asInstanceOf[Long], width, depth)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CmsFunctions {
  def cms_sketch(key: Column, width: Int = 1024, depth: Int = 4): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(key), width, depth).toAggregateExpression())

  def cms_estimate(sketch: Column, key: Column, width: Int = 1024, depth: Int = 4): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(key), width, depth))
}
