package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q51 kernel: greedy longest-match ("maximal munch") subword
  * tokenization over a FIXED vocabulary of 2..maxN code-point grams —
  * the WordPiece/BPE inference rule over a corpus-frequency vocab
  * (tokenizer TRAINING is TextOps.tokenizerVocab; this expression is
  * inference). At each non-whitespace position the longest vocabulary
  * gram starting there is consumed as one token; if none matches, ONE
  * code point is consumed as a fallback token (the byte-fallback rule
  * real tokenizers use for OOV input). Whitespace separates words and
  * is never part of a token — a candidate spanning whitespace cannot
  * be in the vocabulary (vocab grams come from whitespace-split
  * words), so no explicit boundary check is needed.
  *
  * Output: struct<n_tokens bigint, n_fallback bigint> per document.
  * Everything is integer counting over code points, so a DuckDB
  * oracle replays it exactly: per-position match lengths come from an
  * equi-join of position substrings against the vocab, and the greedy
  * scan is a `list_reduce` fold over those lengths ordered by
  * position (see SparkEntry's q51 SQL).
  *
  * Code-point discipline (the s18 lesson, SURVEY §8): positions,
  * lengths and whitespace tests all operate on CODE POINTS, matching
  * Spark's `length`/`substring` and DuckDB's `length`/`substr`;
  * `String.length`/UTF-16 indexing would silently diverge on
  * supplementary-plane text. Whitespace is the ASCII \s class of both
  * java.util.regex and RE2 ([\t\n\x0B\f\r ]) — the separator set the
  * vocab build's split('\s+') uses in both engines.
  *
  * The vocabulary is a constructor parameter (≤ a few hundred short
  * strings): it ships with the serialized expression to every task —
  * a literal-sized broadcast — and builds its lookup set lazily per
  * JVM. Evaluated ONCE per document; CodegenFallback is irrelevant at
  * one call per row (the scan inside is the work — the
  * CharShingleSetExpr precedent).
  */
case class GreedyTokenStatsExpr(child: Expression, vocab: Seq[String], maxN: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxN >= 2, "maxN >= 2")
  require(vocab.forall { g =>
    val n = g.codePointCount(0, g.length)
    n >= 2 && n <= maxN && !g.exists(c => c == ' ' || (c >= '\t' && c <= '\r'))
  }, s"vocab grams must be 2..$maxN code points with no whitespace")

  override def dataType: DataType = new StructType()
    .add("n_tokens", LongType, nullable = false)
    .add("n_fallback", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_stats needs string, got $t")
  }

  @transient private lazy val lut: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val (t, f) = GreedyTokenStatsExpr.walk(
      v.asInstanceOf[UTF8String].toString, lut, maxN)
    InternalRow(t, f)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GreedyTokenStatsExpr {

  /** Evaluation counter, asserted by the single-evaluation spec: a
    * struct-producing expression whose two fields are extracted
    * downstream is at risk of being duplicated by CollapseProject
    * (the q50 double-codec class); the spec pins evals == rows.
    * OFF in production (one volatile read per row, no shared-cacheline
    * increment on the hot path): the spec flips `countEvals` around
    * its measured run.
    */
  private[graft] val evals = new java.util.concurrent.atomic.AtomicLong
  @volatile private[graft] var countEvals = false

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r')

  /** UTF-16 end index of `nCp` code points starting at `start`, or -1
    * if the string ends first.
    */
  private def endIndex(s: String, start: Int, nCp: Int): Int = {
    var i = start
    var k = 0
    val len = s.length
    while (k < nCp) {
      if (i >= len) return -1
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    i
  }

  def walk(s: String, vocab: java.util.HashSet[String], maxN: Int): (Long, Long) = {
    if (countEvals) evals.incrementAndGet()
    val len = s.length
    var nTok = 0L
    var nFall = 0L
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) i += Character.charCount(cp)
      else {
        var matched = 0 // UTF-16 width of the matched gram
        var n = maxN
        while (n >= 2 && matched == 0) {
          val end = endIndex(s, i, n)
          // a candidate reaching into whitespace or the next word is
          // never in the vocab (no-ws invariant) — contains() rejects
          if (end >= 0 && vocab.contains(s.substring(i, end))) matched = end - i
          n -= 1
        }
        nTok += 1
        if (matched > 0) i += matched
        else { nFall += 1; i += Character.charCount(cp) }
      }
    }
    (nTok, nFall)
  }
}

object GreedyTokenizerFunctions {
  /** struct(n_tokens, n_fallback) of greedy longest-match tokenization
    * of `s` over `vocab` (2..maxN code-point grams, no whitespace).
    */
  def token_stats(s: Column, vocab: Seq[String], maxN: Int = 4): Column =
    Bridge.column(GreedyTokenStatsExpr(Bridge.expression(s), vocab, maxN))
}
