package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst vector kernels (SURVEY.md §5: "no UDF in the hot
  * path"). The similarity operators originally used higher-order
  * `zip_with`/`aggregate` lambdas, which are CodegenFallback —
  * interpreted per element. On the O(N²) KNN cross join that's the
  * entire runtime, so the dot product is a first-class codegen'd
  * expression: one tight `double` loop over the two float arrays,
  * inlined into whole-stage codegen.
  *
  * FP CONTRACT: accumulates left→right in double with a 0.0 seed —
  * exactly `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0.0, (acc,x) -> acc+x)` and exactly the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, …), +)` — so results stay
  * bit-identical to both formulations.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_d needs two array<float> args, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch is data corruption: the zip_with formulation
    // this claims bit-parity with would null-pad and return NULL, and
    // a silent truncated dot product would RANK the malformed pair.
    // Fail loudly instead (the simhash-guard convention).
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_d: embedding dims differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_d: embedding dims differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deterministic pseudo-random hyperplane components for the LSH
  * signature — splitmix64 of the (bit, dim) index scaled to [-1, 1).
  * A pure function of the indices: identical on every executor, every
  * run, every cluster size; no RNG state to ship.
  */
object RhpPlanes {
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def plane(j: Int, d: Int): Double =
    mix(j.toLong * 1000003L + d.toLong).toDouble / Long.MaxValue.toDouble
}

/** Random-hyperplane LSH signature of a float-array embedding: bit j =
  * sign(Σ_d emb[d] · plane(j, d)). One codegen'd double loop — the
  * naive formulation (nBits × dim `element_at` terms) builds a
  * 512-node expression tree whose generated code takes seconds to
  * janino-compile and can fall out of codegen entirely.
  */
case class RhpSignatureExpr(child: Expression, nBits: Int, offset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 64, "nBits in [1, 64]")
  require(offset >= 0, "offset >= 0")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_signature needs array<float>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += a.getFloat(d).toDouble * RhpPlanes.plane(offset + j, d)
        d += 1
      }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val dim = ctx.freshName("dim")
      s"""
         |int $dim = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $acc += (double) $a.getFloat($d) * graft.functions.RhpPlanes.plane($offset + $j, $d);
         |  }
         |  if ($acc > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `nTables` random-hyperplane signatures of one embedding in a
  * SINGLE fused expression returning array<long> — table t's element
  * is bit-identical to `RhpSignatureExpr(emb, nBits, t*nBits)` (same
  * global plane indices), but the multi-table LSH projection evaluates
  * one expression instead of nTables separate columns: one codegen'd
  * loop nest, one projection, and the per-table struct assembly that
  * q29 used to do with `array(struct(...)*16)` collapses into a
  * `posexplode` of this array.
  */
case class RhpMultiSignatureExpr(child: Expression, nBits: Int, nTables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 64, "nBits in [1, 64]")
  require(nTables >= 1, "nTables >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_multi_signature needs array<float>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < nBits) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          acc += a.getFloat(d).toDouble * RhpPlanes.plane(t * nBits + j, d)
          d += 1
        }
        if (acc > 0) sig |= (1L << j)
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val dim = ctx.freshName("dim")
      val sigs = ctx.freshName("sigs")
      s"""
         |int $dim = $a.numElements();
         |long[] $sigs = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += (double) $a.getFloat($d)
         |        * graft.functions.RhpPlanes.plane($t * $nBits + $j, $d);
         |    }
         |    if ($acc > 0) $sig |= (1L << $j);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hyperplane weights for the ORACLE-REPRODUCIBLE signature variant
  * (QrhpSignatureExpr): every operation is exact 31-bit integer
  * arithmetic — three multiply-mod-2³¹ rounds with xor-shift mixing in
  * between (murmur-finalizer style, kept under 2³¹ so DuckDB's
  * overflow-checked BIGINT math can replay it verbatim in SQL). No
  * float enters the weight, so Spark and DuckDB agree bit-for-bit.
  * The plain splitmix64-based RhpPlanes above is NOT SQL-replayable
  * (64-bit wrapping multiply overflows DuckDB), which is exactly why
  * this second family exists.
  */
object QrhpPlanes {
  final val Mod: Long = 2147483648L // 2^31
  def weight(j: Int, d: Int): Long = {
    // 1000003 (the RhpPlanes multiplier), not the old 67: x = j·67+d
    // collides for dim ≥ 67 — weight(j, d) == weight(j+1, d−67) — so
    // adjacent planes of a 128/768-dim table would share shifted
    // weights and offset tables would overlap (correlated bits,
    // silently degraded LSH recall). Injective for any dim < 1000003;
    // 1103515245·x stays < 2^63 for every sane (plane, dim) range, so
    // DuckDB's checked BIGINT math still replays it.
    val x = j.toLong * 1000003L + d.toLong
    val s1 = (1103515245L * x + 12345L) % Mod
    val s2 = s1 ^ (s1 >> 16)
    val s3 = (1103515245L * s2 + 12345L) % Mod
    val s4 = s3 ^ (s3 >> 11)
    val s5 = (1103515245L * s4 + 12345L) % Mod
    (s5 >> 16) - 16384L // top 15 bits, centered: [-16384, 16384)
  }
}

/** Quantized random-hyperplane signature: bit j = sign(Σ_d w(j,d) ·
  * q_d) where q_d = floor(emb[d]·2²⁰ + 0.5) (exact: ·2²⁰ is an
  * exponent shift, the +0.5/floor is the same pure-double rounding used
  * by q36). The whole bit is integer arithmetic — no FP sign wobble —
  * so a DuckDB oracle computes the IDENTICAL signature in SQL and
  * LSH-candidate sets match exactly across engines. |Σ| ≤ 64·2¹⁴·|q|
  * stays far under 2⁶³ for any sane embedding scale.
  *
  * `planeOffset` selects plane indices planeOffset..planeOffset+nBits−1
  * — independent signatures for multi-table banding (the seeding
  * x = j·1000003 + d is injective for any dim < 1000003, so offset
  * tables share no hyperplanes), replayed in SQL by simply extending
  * the plane range.
  */
case class QrhpSignatureExpr(child: Expression, nBits: Int, planeOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 64, "nBits in [1, 64]")
  require(planeOffset >= 0, "planeOffset >= 0")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qrhp_signature needs array<float>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0L
      var d = 0
      while (d < dim) {
        val q = math.floor(a.getFloat(d).toDouble * 1048576.0 + 0.5).toLong
        acc += QrhpPlanes.weight(planeOffset + j, d) * q
        d += 1
      }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val dim = ctx.freshName("dim")
      val q = ctx.freshName("q")
      s"""
         |int $dim = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    long $q = (long) java.lang.Math.floor((double) $a.getFloat($d) * 1048576.0 + 0.5);
         |    $acc += graft.functions.QrhpPlanes.weight($planeOffset + $j, $d) * $q;
         |  }
         |  if ($acc >= 0L) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQL-replayable hash constants shared by the minhash permutations
  * (q25, indices 0..numPerm-1), the simhash bit hashes (q26, indices
  * 64..127 — SimHashLanes below), and the sampling hash (q37, index
  * 200): multiply-mod-prime universal hashing h(s) = (a·s + b) mod
  * (2³¹−1) with LCG-derived a/b — every term a closed-form integer
  * expression DuckDB evaluates without overflow, so every pipeline
  * keyed on it is oracle-checkable (the reason xxhash64, which needs
  * 64-bit wrapping multiplies, is NOT used here). Exposed to operators
  * as `Dedup.ReplayableHash`; defined here so the fused kernels in
  * this file draw the SAME a/b stream instead of duplicating the
  * derivation.
  */
object ReplayableHash {
  val P: Long = 2147483647L // 2^31 - 1, prime
  val M: Long = 1000000007L
  def a(i: Int): Long = (1103515245L * (2L * i + 1L) + 12345L) % 2147483648L
  def b(i: Int): Long = (1103515245L * (2L * i + 2L) + 12345L) % 2147483648L
}

/** Packed per-token SimHash bit parities. For token hash h, bit j's
  * draw is parity p_j = ((a_{64+j}·h + b_{64+j}) mod (2³¹−1)) mod 2 —
  * the exact q26 hash family (Dedup.ReplayableHash, SQL-replayable).
  * The 64 parities pack into 22 longs, 3 fields × 21 bits each:
  * summing the packed longs per document sums every field
  * independently (no cross-field carry below 2²¹ ≈ 2M tokens/doc), so
  * the signature aggregation is 22 plain `sum` columns instead of 64
  * `sum(when ...)` aggregates — the r2 version's 2.2× q26 cost. The
  * signed bit-j sum is recovered as 2·Σp_j − n (n = token count), and
  * bit j of the simhash is set iff 2·Σp_j > n, identical to the ±1
  * formulation.
  */
object SimHashLanes {
  final val FieldBits = 21
  final val FieldsPerLane = 3
  final val NBits = 64
  final val NLanes = 22 // ceil(64 / 3)
  final val MaxTokens = (1L << FieldBits) - 1 // per-doc bound, ~2M

  def pack(h: Long): Array[Long] = {
    // enforce the poly_hash domain: for h < 0 the JVM remainder is
    // negative and the `% 2` parity test never fires (every bit biased
    // to 0); for h >= 2^32 the a*h multiply wraps. Both corrupt
    // signatures SILENTLY and break oracle replay — fail loudly
    // instead (one branch per token, negligible next to the hashing).
    if (h < 0L || h >= ReplayableHash.P)
      throw new IllegalArgumentException(
        s"simhash_lanes: token hash $h outside the poly_hash domain [0, ${ReplayableHash.P})")
    val out = new Array[Long](NLanes)
    var j = 0
    while (j < NBits) {
      // a/b indices 64..127 — the same ReplayableHash stream the q26
      // oracle replays (indices 0..63 belong to the q25 permutations)
      val i = 64 + j
      if (((ReplayableHash.a(i) * h + ReplayableHash.b(i)) % ReplayableHash.P) % 2L == 1L)
        out(j / FieldsPerLane) |= 1L << ((j % FieldsPerLane) * FieldBits)
      j += 1
    }
    out
  }
}

/** simhash_lanes(h): the 22 packed parity lanes of one token hash —
  * a single fused evaluation per token where the unpacked form was 64
  * expression trees.
  */
case class SimHashLanesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_lanes needs bigint, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(SimHashLanes.pack(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SimHashLanes.pack($h));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Base-31 polynomial rolling hash over code points, mod 1e9+7 — the
  * q21 fingerprint contract, packaged as a codegen'd expression so
  * dedup pipelines can hash shingles/tokens per ROW (the higher-order
  * `aggregate` lambda form is CodegenFallback and cannot be nested
  * inside another lambda without per-element re-evaluation). DuckDB
  * replays it verbatim: `list_reduce(list_prepend(0, list_transform(
  * range(1, length(s)+1), i -> unicode(substring(s, i, 1)))),
  * (h, c) -> (h*31 + c) % 1000000007)` — so every operator keyed on
  * this hash is oracle-checkable end to end.
  */
case class PolyHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_hash needs string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    PolyHashExpr.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHashExpr.hash($s.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization of a string column (the q75 kernel).
  * Spark has NO built-in normalization function, so this is the
  * canonical custom-Expression case (SURVEY §2 preference order (b)):
  * a thin codegen'd shim over `java.text.Normalizer` — the JDK's
  * implementation of the Unicode-standard canonical composition, the
  * SAME algorithm DuckDB's utf8proc `nfc_normalize` implements, which
  * is what makes the operator oracle-checkable (probed identical on
  * composed/decomposed/ligature cases; normalization of assigned
  * codepoints is stabilized by the Unicode policy, so engine version
  * skew cannot bite).
  *
  * ASCII fast path: NFC is the identity on ASCII, and UTF8String
  * tracks full-ASCII-ness — the overwhelmingly common case costs one
  * branch and ZERO copies (the bytes pass through untouched), so a
  * 100 TB mostly-ASCII corpus pays the String round-trip only on the
  * rows that can actually change.
  */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (s.isFullAscii) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
}

/** Squared L2 distance of two bigint-array columns in one tight int64
  * loop — the q60/q63 hot-path kernel. The higher-order
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)`
  * formulation it replaces is CodegenFallback: interpreted per
  * ELEMENT, it ran q63's 1.5M-candidate × 64-dim scoring essentially
  * single-threaded-slow (bench: 15 s wall at 17 s CPU on 32 cores).
  * Integer addition is associative, so unlike the FP kernels there is
  * no accumulation-order contract to preserve — any loop order equals
  * the lambda fold and the DuckDB list_reduce replay bit-for-bit.
  * Arrays must be equal length (the quantized q60 frames always are);
  * unequal lengths throw rather than silently truncating. Null
  * ELEMENTS also throw (fail-fast): ArrayData.getLong would read a
  * null slot as 0 and produce a silently wrong distance where the
  * lambda fold propagates NULL — the quantize() producers never emit
  * null elements, so a null here is a caller bug worth surfacing.
  */
case class L2DistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_dist needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    L2DistExpr.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.L2DistExpr.dist($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2DistExpr {
  def dist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"l2_dist arrays differ in length: $n vs ${b.numElements()}")
    var d = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"l2_dist: null element at index $i (getLong would read it as 0)")
      val x = a.getLong(i) - b.getLong(i)
      d += x * x
      i += 1
    }
    d
  }
}

/** Fixed-point base-2 logarithm, Q16 (16 fractional bits), of a
  * POSITIVE bigint — the transcendental-free log kernel for LM
  * perplexity (q61) and idf-style weights. `Math.log` is a libm call
  * whose last ulp differs between engines, so a double log can never
  * be hash-compared against DuckDB; this instead computes log2 by the
  * classical shift-and-square algorithm in pure int64 arithmetic:
  *
  *   m = floor(log2 x)          (position of the top set bit)
  *   z = floor(x·2^16 / 2^m)    (mantissa in [2^16, 2^17))
  *   16 rounds: z = (z·z) >> 16; if z ≥ 2^17 { z >>= 1; emit bit }
  *   result = m·2^16 + emitted fraction bits
  *
  * Every step is a truncating shift on nonnegative int64 — DuckDB
  * replays it verbatim as a 16-step WITH RECURSIVE over
  * `length(bin(x))-1`, `//` and `<<` (the `s(x, z, r, i)` CTE in the
  * q61/q62 oracles), so any operator keyed on these values is
  * oracle-checkable bit-for-bit.
  * The value is within 17·2^-16 of true log2 (truncation at each
  * squaring loses < 2^-16); the DETERMINISM, not the last bit of
  * accuracy, is the contract — perplexity ranks identically.
  */
case class Log2Q16Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"log2_q16 needs bigint, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Log2Q16Expr.compute(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Log2Q16Expr.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Log2Q16Expr {
  /** Throws on x < 1 (ANSI-style fail-loud; call sites feed counts+1
    * ≥ 1 by construction — a silent 0 would poison a whole corpus
    * score unnoticed).
    */
  def compute(x: Long): Long = {
    if (x < 1L) throw new IllegalArgumentException(s"log2_q16 needs x >= 1, got $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    // floor(x·2^16 / 2^m) without overflow for any x: shift the
    // smaller direction (identical to the SQL's (x*65536) // (1<<m)
    // on the BIGINT-safe domain)
    var z = if (m >= 16) x >>> (m - 16) else x << (16 - m)
    var r = m.toLong << 16
    var i = 1
    while (i <= 16) {
      z = (z * z) >> 16
      if (z >= 131072L) { z >>= 1; r |= 1L << (16 - i) }
      i += 1
    }
    r
  }
}

object PolyHashExpr {
  final val Mod = 1000000007L
  /** Iterates CODE POINTS (not UTF-16 units), matching DuckDB's
    * per-character `unicode(substring(s, i, 1))`.
    */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** winnow_set(toks, k, w): the WINNOWING fingerprint selection of
  * Schleimer/Wilkerson/Aiken (SIGMOD 2003, the MOSS algorithm) in one
  * fused evaluation per document — the q91 kernel.
  *
  * Over the token array it computes the base-31 poly hash (the q21
  * contract, [[PolyHashExpr.hash]] verbatim) of every k-token gram,
  * slides a window of w consecutive gram hashes, and in each window
  * selects the RIGHTMOST minimum (the paper's tie rule), recording a
  * selection only when it differs from the previous window's (the
  * paper's "record when new" rule — dedup is positional, and since
  * window starts only move right, equal (hash, pos) selections are
  * always consecutive). Selections are returned packed as
  * `hash * 2^21 + pos` (pos 1-based; hash < 2^30 so the pack fits a
  * long with room) so ONE bigint column carries both fields through
  * shuffles and the DuckDB replay splits them with `//` and `%`.
  *
  * The winnowing guarantee (paper §3): every window of w consecutive
  * grams contributes at least one selected fingerprint, so any two
  * documents sharing a substring of at least w + k - 1 tokens share
  * at least one fingerprint — while expected density is only
  * 2/(w+1) of all grams. That is the whole point at 100 TB: q25's
  * MinHash keeps a FIXED-size sketch per doc (good for whole-doc
  * similarity, blind to containment), q71 keeps EVERY window digest
  * (exact, but posting volume = corpus size); winnowing is the
  * guaranteed-detection middle at ~1/3 the posting volume, and the
  * selection itself is a pure map — zero exchange until the match
  * join.
  *
  * Short docs: fewer than k tokens hash as one truncated gram (the
  * q25 postings convention); fewer than w grams winnow as one
  * truncated window (global min). CodegenFallback like the other
  * fused set kernels: one call per row does all the work, which is
  * exactly the case where fallback costs nothing (§8 — the hazard is
  * per-ELEMENT interpretation inside lambdas, not per-row calls).
  */
case class WinnowSetExpr(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k > 0, "gram width must be positive")
  require(w > 0, "winnow window must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_set needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowSetExpr.winnow(v.asInstanceOf[ArrayData], k, w)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSetExpr {
  final val PosBits = 21
  final val PosCap = (1 << PosBits) - 1 // 2,097,151 grams per doc

  def winnow(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = math.max(n - k + 1, 1)
    require(m <= PosCap,
      s"winnow_set: $m grams exceeds the 2^21-1 per-document cap — chunk upstream (q85)")
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var t = i
      val end = math.min(i + k, n)
      while (t < end) {
        if (t > i) sb.append(' ')
        val tok = toks.getUTF8String(t)
        if (tok != null) sb.append(tok.toString)
        t += 1
      }
      h(i) = PolyHashExpr.hash(sb.toString)
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val out = new Array[Long](nw)
    var cnt = 0
    var lastSel = -1
    var j = 0
    while (j < nw) {
      var best = j
      var p = j + 1
      val end = math.min(j + w, m)
      while (p < end) {
        if (h(p) <= h(best)) best = p // <= keeps the RIGHTMOST minimum
        p += 1
      }
      if (best != lastSel) {
        out(cnt) = (h(best) << PosBits) | (best + 1).toLong
        cnt += 1
        lastSel = best
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }
}

/** Distinct rolling n-codepoint-gram hash set of a string, in ONE
  * pass over its UTF-8 bytes — replaces the `transform(sequence(…),
  * i -> xxhash64(substring(norm, i, n)))` formulation, whose
  * per-position substring walks from the string start (UTF8String
  * substring is O(position)), making a document cost O(len²) — that
  * scan was ~4 s of q27's 4.3 s per invocation at sf0.1. Hashing only
  * gates SET MEMBERSHIP in q27 (the oracle replays STRING shingles),
  * so any injective-enough hash serves; this uses XXH64 over the
  * window's UTF-8 bytes — n-codepoint windows map 1:1 to byte slices,
  * so shingle equality is preserved exactly. Edge semantics match the
  * old form: strings shorter than n (including "") yield ONE shingle,
  * the whole string. Evaluated once per DOCUMENT (CodegenFallback is
  * irrelevant at one call per row; the loop inside is the work).
  */
case class CharShingleSetExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n > 0, "shingle width must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingle_set needs string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    CharShingleSetExpr.shingles(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingleSetExpr {
  private final val Seed = 42L

  def shingles(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // codepoint boundaries: starts(i) = byte offset of codepoint i,
    // starts(numChars) = total bytes
    val starts = new Array[Int](bytes.length + 1)
    var numChars = 0
    var off = 0
    while (off < bytes.length) {
      starts(numChars) = off
      off += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(off))
      numChars += 1
    }
    starts(numChars) = bytes.length
    val windows = math.max(numChars - n + 1, 1)
    val buf = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val a = if (w < numChars) starts(w) else 0
      val b = starts(math.min(w + n, numChars))
      buf(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + a, b - a, Seed)
      w += 1
    }
    java.util.Arrays.sort(buf)
    var k = 0
    var i = 0
    while (i < windows) {
      if (i == 0 || buf(i) != buf(i - 1)) { buf(k) = buf(i); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }
}

object VectorFunctions {
  /** Sequential-order double dot product of two float-array columns. */
  def dot_d(a: Column, b: Column): Column =
    Bridge.column(DotProductD(Bridge.expression(a), Bridge.expression(b)))

  /** nBits-bit random-hyperplane LSH signature of a float-array column.
    * `offset` shifts the global hyperplane index — independent tables
    * draw disjoint plane ranges (table t passes offset = t·nBits), so
    * the table count is not capped by one 64-bit signature.
    */
  def rhp_signature(emb: Column, nBits: Int, offset: Int = 0): Column =
    Bridge.column(RhpSignatureExpr(Bridge.expression(emb), nBits, offset))

  /** All nTables rhp signatures at once as array<long> — element t ==
    * rhp_signature(emb, nBits, t*nBits), one fused evaluation.
    */
  def rhp_multi_signature(emb: Column, nBits: Int, nTables: Int): Column =
    Bridge.column(RhpMultiSignatureExpr(Bridge.expression(emb), nBits, nTables))

  /** nBits-bit QUANTIZED random-hyperplane signature (integer-exact,
    * DuckDB-oracle-reproducible) of a float-array column.
    */
  def qrhp_signature(emb: Column, nBits: Int, planeOffset: Int = 0): Column =
    Bridge.column(QrhpSignatureExpr(Bridge.expression(emb), nBits, planeOffset))

  /** Base-31 mod-1e9+7 polynomial hash of a string column (the q21
    * fingerprint contract; DuckDB-oracle-reproducible).
    */
  def poly_hash(s: Column): Column =
    Bridge.column(PolyHashExpr(Bridge.expression(s)))

  /** Q16 fixed-point log2 of a positive bigint column (the q61
    * perplexity kernel; DuckDB-oracle-reproducible — no libm).
    */
  def log2_q16(x: Column): Column =
    Bridge.column(Log2Q16Expr(Bridge.expression(x)))

  /** Squared L2 distance of two bigint-array columns (the q60/q63
    * integer hot-path kernel; order-free integer sum — replay-exact).
    */
  def l2_dist(a: Column, b: Column): Column =
    Bridge.column(L2DistExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Unicode NFC normalization of a string column (the q75 kernel;
    * DuckDB-oracle-reproducible via utf8proc's nfc_normalize).
    */
  def nfc_normalize(s: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(s)))

  /** The 22 packed SimHash parity lanes of a token-hash column. */
  def simhash_lanes(h: Column): Column =
    Bridge.column(SimHashLanesExpr(Bridge.expression(h)))

  /** Distinct rolling n-codepoint-gram XXH64 set of a string column
    * (the q27 shingle kernel; membership-only hashing).
    */
  def char_shingle_set(s: Column, n: Int): Column =
    Bridge.column(CharShingleSetExpr(Bridge.expression(s), n))

  def winnow_set(toks: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowSetExpr(Bridge.expression(toks), k, w))
}
