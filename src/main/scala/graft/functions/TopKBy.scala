package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (ord, id) pairs under the
  * ordering (ord DESC, id ASC). A plain size-k insertion structure —
  * for the k in play (≤ ~100) linear insertion beats heap constant
  * factors and keeps merge deterministic.
  */
final class TopKBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** true if (a, ia) ranks strictly better than (b, ib). TOTAL order
    * via Double.compare, not `>`: raw comparisons are false for NaN on
    * either side, so a NaN ord (a zero-norm embedding's 0/0 cosine)
    * compared with `>` would block the shift loop mid-array and leave
    * the buffer order inconsistent. Double.compare ranks NaN greatest,
    * and under this buffer's (ord DESC, id ASC) ordering greatest means
    * BEST — a NaN ord seats at the TOP of the buffer, exactly where
    * Spark's `ORDER BY ord DESC` row_number window (and the DuckDB
    * oracle's) would rank it, since both treat NaN as the largest
    * double. Callers who don't want NaN in their top-k must filter it
    * upstream (the KNN kernels never produce one: norms are guarded).
    */
  @inline private def better(a: Double, ia: Long, b: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(a, b)
    c > 0 || (c == 0 && ia < ib)
  }

  def insert(ord: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      while (i > 0 && better(ord, id, ords(i - 1), ids(i - 1))) {
        ords(i) = ords(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      ords(i) = ord; ids(i) = id; n += 1
    } else if (n > 0 && better(ord, id, ords(n - 1), ids(n - 1))) {
      var i = n - 1
      while (i > 0 && better(ord, id, ords(i - 1), ids(i - 1))) {
        ords(i) = ords(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      ords(i) = ord; ids(i) = id
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ords(i), other.ids(i)); i += 1 }
  }

  /** insert, skipping ids already present — for inputs where the same
    * (ord, id) candidate can arrive several times (e.g. a pair that
    * collides in multiple LSH tables). Only valid when duplicates
    * carry an IDENTICAL ord (true for re-scored candidate pairs): the
    * first occurrence then already sits at the right rank, and a
    * buffer never holds two entries for one id, so dedup survives
    * partial-buffer merges too.
    */
  def insertDistinct(ord: Double, id: Long): Unit = {
    var i = 0
    while (i < n) { if (ids(i) == id) return; i += 1 }
    insert(ord, id)
  }

  def mergeFromDistinct(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insertDistinct(other.ords(i), other.ids(i)); i += 1 }
  }
}

/** `top_k_by(ord, id, k)` — per-group top-k as a TypedImperativeAggregate
  * (SURVEY.md §5): map-side partials keep only k rows per group per
  * partition, so the exchange that a row_number() window would feed
  * with the ENTIRE candidate set (N² rows for brute-force KNN) carries
  * N×k rows instead, and nothing ever sorts the full set. Output:
  * array<struct<ord double, id bigint>> ranked best-first under
  * (ord DESC, id ASC) — the same deterministic order the window
  * formulation (and the DuckDB oracle) uses.
  */
case class TopKBy(ordChild: Expression, idChild: Expression, k: Int,
                  distinctIds: Boolean = false,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  // declared input types: a wrong-typed SQL argument fails analysis
  // with a named coercion error (and int ids / float ords coerce for
  // free) instead of a bare executor-side ClassCastException
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(DoubleType, LongType)

  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(ordChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("ord", DoubleType).add("id", LongType), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordChild.eval(input)
    val i = idChild.eval(input)
    if (o != null && i != null) {
      if (distinctIds) buf.insertDistinct(o.asInstanceOf[Double], i.asInstanceOf[Long])
      else buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    if (distinctIds) buf.mergeFromDistinct(other) else buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ords(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.ords(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    // defensive (the BottomKByHash pattern): a corrupt/truncated
    // payload with n outside [0, k] must fail with a diagnostic, not
    // a raw AIOOBE deep in the copy loop
    require(n >= 0 && n <= buf.k, s"top_k_by payload n=$n outside [0, ${buf.k}]")
    var i = 0
    while (i < n) { buf.ords(i) = in.readDouble(); buf.ids(i) = in.readLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ordChild = newChildren(0), idChild = newChildren(1))
}

object TopKByFunctions {
  /** Top-k (ord, id) pairs per group, best-first by (ord DESC, id ASC). */
  def top_k_by(ord: Column, id: Column, k: Int): Column =
    Bridge.column(TopKBy(Bridge.expression(ord), Bridge.expression(id), k)
      .toAggregateExpression())

  /** top_k_by that also DEDUPLICATES by id — duplicate candidates
    * (which must carry the same ord) count once, replacing a standalone
    * `distinct()` exchange on the candidate set.
    */
  def top_k_by_distinct(ord: Column, id: Column, k: Int): Column =
    Bridge.column(TopKBy(Bridge.expression(ord), Bridge.expression(id), k,
      distinctIds = true).toAggregateExpression())
}
