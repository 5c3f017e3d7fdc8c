package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer under the LEXICOGRAPHIC ordering
  * (ord_desc DESC, ord_asc ASC, key ASC) with a string key — the
  * (tf DESC, df ASC, token ASC) salience contract of q40, generalized.
  * Same linear size-k insertion as TopKBuffer: for k ≤ ~100 it beats
  * heap constant factors and keeps merge deterministic. Key order is
  * UTF8String binary order == Spark string comparison == DuckDB's
  * default (binary) collation, so ranks replay in the oracle.
  */
final class TopKLexBuffer(val k: Int) {
  val ds = new Array[Long](k)
  val as = new Array[Long](k)
  val keys = new Array[UTF8String](k)
  var n = 0

  @inline private def better(d: Long, a: Long, key: UTF8String,
                             i: Int): Boolean = {
    if (d != ds(i)) d > ds(i)
    else if (a != as(i)) a < as(i)
    else key.compareTo(keys(i)) < 0
  }

  def insert(d: Long, a: Long, key: UTF8String): Unit = {
    if (n < k) {
      var i = n
      while (i > 0 && better(d, a, key, i - 1)) {
        ds(i) = ds(i - 1); as(i) = as(i - 1); keys(i) = keys(i - 1); i -= 1
      }
      ds(i) = d; as(i) = a; keys(i) = key; n += 1
    } else if (n > 0 && better(d, a, key, n - 1)) {
      var i = n - 1
      while (i > 0 && better(d, a, key, i - 1)) {
        ds(i) = ds(i - 1); as(i) = as(i - 1); keys(i) = keys(i - 1); i -= 1
      }
      ds(i) = d; as(i) = a; keys(i) = key
    }
  }

  def mergeFrom(other: TopKLexBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ds(i), other.as(i), other.keys(i)); i += 1 }
  }
}

/** `top_k_lex(ord_desc, ord_asc, key, k)` — per-group top-k rows under
  * (ord_desc DESC, ord_asc ASC, key ASC), the hash-aggregate
  * replacement for a row_number window when only the best k rows per
  * key are needed (SURVEY.md §8): map-side partials keep k rows per
  * group per partition, the exchange carries groups×k rows, and
  * nothing ever sorts the full set. Output: array<struct<ord_desc
  * bigint, ord_asc bigint, key string>> ranked best-first.
  */
case class TopKLex(descChild: Expression, ascChild: Expression,
                   keyChild: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLexBuffer]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(LongType, LongType, StringType)

  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(descChild, ascChild, keyChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("ord_desc", LongType).add("ord_asc", LongType).add("key", StringType),
    containsNull = false)

  override def createAggregationBuffer(): TopKLexBuffer = new TopKLexBuffer(k)

  override def update(buf: TopKLexBuffer, input: InternalRow): TopKLexBuffer = {
    val d = descChild.eval(input)
    val a = ascChild.eval(input)
    val key = keyChild.eval(input)
    if (d != null && a != null && key != null)
      // clone: the UTF8String may point into a reused row buffer
      buf.insert(d.asInstanceOf[Long], a.asInstanceOf[Long],
        key.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKLexBuffer, other: TopKLexBuffer): TopKLexBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKLexBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ds(i), buf.as(i), buf.keys(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKLexBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeLong(buf.ds(i)); out.writeLong(buf.as(i))
      val kb = buf.keys(i).getBytes
      out.writeInt(kb.length); out.write(kb)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLexBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKLexBuffer(in.readInt())
    val n = in.readInt()
    require(n >= 0 && n <= buf.k, s"top_k_lex payload n=$n outside [0, ${buf.k}]")
    var i = 0
    while (i < n) {
      buf.ds(i) = in.readLong(); buf.as(i) = in.readLong()
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.keys(i) = UTF8String.fromBytes(kb)
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLex =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLex =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLex =
    copy(descChild = newChildren(0), ascChild = newChildren(1), keyChild = newChildren(2))
}

object TopKLexFunctions {
  /** Top-k (ord_desc, ord_asc, key) rows per group, best-first by
    * (ord_desc DESC, ord_asc ASC, key ASC).
    */
  def top_k_lex(ordDesc: Column, ordAsc: Column, key: Column, k: Int): Column =
    Bridge.column(TopKLex(Bridge.expression(ordDesc), Bridge.expression(ordAsc),
      Bridge.expression(key), k).toAggregateExpression())
}
