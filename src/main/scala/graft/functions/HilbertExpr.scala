package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D HILBERT-CURVE index (q93b) — the space-filling-curve layout
  * key next to q93's z-order: the Hilbert curve never takes z-order's
  * long diagonal jumps (consecutive indices are ALWAYS grid
  * neighbors), so a run of consecutive curve positions covers a
  * tighter key-space box — the known box-query advantage over
  * Morton order (Moon/Jagadish/Faloutsos/Saltz, TKDE 2001, "Analysis
  * of the clustering properties of the Hilbert space-filling curve").
  *
  * Algorithm: the classic iterative xy→d walk (one reflect/swap
  * quadrant transform per bit level, high bit first) — a sequential
  * per-level state update, which is exactly the shape that must NOT
  * be unrolled into nested Catalyst CASE expressions: each level
  * reads the previous level's (x, y) twice, so inlining grows the
  * tree 2^bits-fold (the q67 DuckDB CTE-inlining lesson, Spark side).
  * A fused codegen'd kernel — one tight long loop per row, inside
  * whole-stage codegen — is the §2 preference-(b) answer. The DuckDB
  * oracle replays the SAME walk as `bits` unrolled MATERIALIZED CTE
  * levels (each level materialized once, so no blowup there either —
  * [[graft.operators.Layout.hilbertLevelSql]] generates them from
  * this file's semantics).
  *
  * Inputs are the two grid coordinates (already range-scaled to
  * [0, 2^bits)); out-of-range input fails loudly (the dot_d
  * convention — a silently-wrapped coordinate would place the row in
  * an arbitrary file). Output d ∈ [0, 4^bits) visits every cell
  * exactly once (bijectivity + unit-step continuity spec-pinned at
  * bits=4 by exhaustive enumeration).
  */
case class HilbertExpr(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"hilbert bits out of range: $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_d needs two bigint args, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpr.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val nMinus1 = (1L << bits) - 1L
      s"""
         |long $x = $a; long $y = $b;
         |if ($x < 0L || $x > ${nMinus1}L || $y < 0L || $y > ${nMinus1}L) {
         |  throw new IllegalArgumentException(
         |    "hilbert_d: grid coordinate out of [0, ${nMinus1}]: (" + $x + ", " + $y + ")");
         |}
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${nMinus1}L - $x; $y = ${nMinus1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {
  /** The reference walk — the single definition of the semantics; the
    * codegen above and the oracle CTE generator mirror it level for
    * level, and the spec compares the kernel against this on
    * exhaustive small grids and sampled 16-bit points.
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val nMinus1 = (1L << bits) - 1L
    require(x0 >= 0 && x0 <= nMinus1 && y0 >= 0 && y0 <= nMinus1,
      s"hilbert_d: grid coordinate out of [0, $nMinus1]: ($x0, $y0)")
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = nMinus1 - x; y = nMinus1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → (x, y)) — spec-side only: proves bijectivity
    * and gives the continuity check its coordinates.
    */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  def hilbert_d(x: Column, y: Column, bits: Int = 16): Column =
    Bridge.column(HilbertExpr(Bridge.expression(x), Bridge.expression(y), bits))
}
