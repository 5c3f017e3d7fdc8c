package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q101 kernel: VITERBI SEGMENTATION under a unigram language model
  * (Kudo, "Subword Regularization", ACL 2018 — the SentencePiece
  * unigram model's inference rule): over each whitespace-separated
  * word, the minimum-total-cost segmentation into vocabulary pieces,
  * where cost(piece) is an integer Q16 negative log2 probability
  * (the Log2Q16Expr unit system — no libm anywhere, so the DP
  * replays bit-for-bit in DuckDB). Emits the pieces of every word in
  * order as one ARRAY<STRING> per input string.
  *
  * DP contract (the oracle replays it verbatim as a recursive CTE —
  * see SparkEntry's q101 SQL):
  *   best[0] = 0
  *   best[j] = min over l in 1..min(maxLen, j) of
  *               best[j-l] + cost(word[j-l..j])     (piece in vocab)
  *   tie-break: candidates compare as best·8 + (maxLen - l), so equal
  *   costs resolve to the LONGEST piece — the deterministic rule the
  *   paper leaves open (requires maxLen ≤ 7 so the tie field fits in
  *   3 bits; the registered instance runs maxLen = 4).
  * Unknown single code points (possible at ENCODE time — training
  * words all contribute their characters to the vocab) cost
  * `unkCostQ16` and are emitted verbatim — the byte-fallback analog;
  * a missing longer piece simply contributes no candidate, so the DP
  * is always feasible via the single-code-point ladder.
  *
  * Code-point discipline (the q51/s18 lesson): positions, lengths and
  * the whitespace class ([\t\n\x0B\f\r ]) all operate on CODE POINTS,
  * matching Spark's `length`/`substr` and DuckDB's `length`/`substr`.
  *
  * The vocabulary (piece → cost, model-sized: ≤ a few hundred short
  * strings) ships inside the serialized expression to every task and
  * builds its lookup map lazily per JVM — the GreedyTokenStatsExpr
  * protocol. One evaluation per row; the scan inside is the work, so
  * CodegenFallback costs nothing measurable.
  */
case class UnigramSegExpr(child: Expression, vocab: Seq[(String, Long)],
                          maxLen: Int, unkCostQ16: Long)
    extends UnaryExpression with CodegenFallback {

  require(maxLen >= 1 && maxLen <= 7, "maxLen must be 1..7 (3-bit tie field)")
  require(unkCostQ16 > 0, "unkCostQ16 must be positive")
  require(vocab.forall { case (p, c) =>
    val n = p.codePointCount(0, p.length)
    n >= 1 && n <= maxLen && c >= 0 &&
      !p.exists(ch => ch == ' ' || (ch >= '\t' && ch <= '\r'))
  }, s"vocab pieces must be 1..$maxLen code points, no whitespace, cost >= 0")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unigram_seg needs string, got $t")
  }

  @transient private lazy val lut: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](math.max(16, vocab.size * 2))
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val pieces = UnigramSegExpr.segment(
      v.asInstanceOf[UTF8String].toString, lut, maxLen, unkCostQ16)
    new GenericArrayData(pieces.map(UTF8String.fromString(_)): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegExpr {

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r')

  /** Viterbi over ONE whitespace-free word given as (string, code-point
    * start offsets). Appends the chosen pieces to `out` in order.
    * Candidates compare as packed = cumCost·8 + (maxLen − l): minimum
    * cost wins, ties go to the longer piece — exactly the oracle's
    * `list_min` over the same packing.
    */
  private def viterbiWord(s: String, starts: Array[Int], nCp: Int,
                          lut: java.util.HashMap[String, java.lang.Long], maxLen: Int,
                          unk: Long,
                          out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val best = new Array[Long](nCp + 1)
    val bp = new Array[Int](nCp + 1)
    var j = 1
    while (j <= nCp) {
      var bestPacked = Long.MaxValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxLen, j)
      while (l <= lMax) {
        val piece = s.substring(starts(j - l), starts(j))
        val c = lut.get(piece)
        val cost =
          if (c != null) c.longValue()
          else if (l == 1) unk
          else -1L
        if (cost >= 0L) {
          val packed = (best(j - l) + cost) * 8L + (maxLen - l)
          if (packed < bestPacked) { bestPacked = packed; bestL = l }
        }
        l += 1
      }
      best(j) = bestPacked / 8L
      bp(j) = bestL
      j += 1
    }
    // backwalk collects pieces right-to-left; emit in word order
    var pos = nCp
    var nPieces = 0
    val tmp = new Array[String](nCp)
    while (pos > 0) {
      val l = bp(pos)
      tmp(nPieces) = s.substring(starts(pos - l), starts(pos))
      nPieces += 1
      pos -= l
    }
    var i = nPieces - 1
    while (i >= 0) { out += tmp(i); i -= 1 }
  }

  /** Segment a string: whitespace separates words (never emitted);
    * each word is Viterbi-segmented independently.
    */
  def segment(text: String, lut: java.util.HashMap[String, java.lang.Long],
              maxLen: Int, unk: Long): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val len = text.length
    var i = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      if (isWs(cp)) i += Character.charCount(cp)
      else {
        // collect the word's code-point start offsets
        val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
        var k = i
        var done = false
        while (k < len && !done) {
          val c = text.codePointAt(k)
          if (isWs(c)) done = true
          else { starts += k; k += Character.charCount(c) }
        }
        val wordEnd = if (starts.isEmpty) k else {
          val last = starts.last
          last + Character.charCount(text.codePointAt(last))
        }
        starts += wordEnd // sentinel: starts(nCp) = end offset
        viterbiWord(text, starts.toArray, starts.length - 1, lut, maxLen, unk, out)
        i = wordEnd
      }
    }
    out.toArray
  }

  /** The cumulative Viterbi COST of segmenting one whitespace-free
    * word (no piece emission) — the prune stage's altCost helper runs
    * this over piece strings with the piece itself banned via
    * `banFullSpan`.
    */
  def segCost(word: String, lut: java.util.HashMap[String, java.lang.Long],
              maxLen: Int, unk: Long, banFullSpan: Boolean): Long = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var k = 0
    while (k < word.length) {
      starts += k; k += Character.charCount(word.codePointAt(k))
    }
    starts += word.length
    val nCp = starts.length - 1
    val best = new Array[Long](nCp + 1)
    var j = 1
    while (j <= nCp) {
      var bestPacked = Long.MaxValue
      var l = 1
      val lMax = math.min(maxLen, j)
      while (l <= lMax) {
        val banned = banFullSpan && l == nCp && j == nCp
        if (!banned) {
          val piece = word.substring(starts(j - l), starts(j))
          val c = lut.get(piece)
          val cost =
            if (c != null) c.longValue()
            else if (l == 1) unk
            else -1L
          if (cost >= 0L) {
            val packed = (best(j - l) + cost) * 8L + (maxLen - l)
            if (packed < bestPacked) bestPacked = packed
          }
        }
        l += 1
      }
      best(j) = bestPacked / 8L
      j += 1
    }
    best(nCp)
  }
}

object UnigramSegFunctions {
  /** array<string> of Viterbi unigram-LM pieces of `s` (whitespace
    * separates words; unknown single code points cost `unkCostQ16`).
    */
  def unigram_seg(s: Column, vocab: Seq[(String, Long)], maxLen: Int,
                  unkCostQ16: Long): Column =
    Bridge.column(UnigramSegExpr(Bridge.expression(s), vocab, maxLen, unkCostQ16))
}
