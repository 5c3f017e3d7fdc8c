package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q101/q101b unigram-LM tokenizer: the value gate is the DuckDB
  * unrolled-CTE oracle; these pin the algorithm against a hand replay
  * (seed counts, hard-EM recosting, the prune arithmetic), Viterbi
  * optimality against brute-force enumeration, the UNK fallback, and
  * partitioning invariance.
  */
class UnigramSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Unigram
  import graft.functions.{Log2Q16Expr, UnigramSegExpr}

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def model(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hand-replayed micro corpus: seeds, hard-EM counts, smoothed Q16 costs") {
    // words: ab ×2, b ×1. Substring counts (overlap-weighted):
    // a=2, b=3, ab=2 → chars {a,b}, one seed {ab}.
    // T0+V0 = 7+3 = 10. EM: "ab" → [ab] (cheaper than a+b, and longer
    // on any tie), "b" → [b] ⇒ counts (a=0, b=1, ab=2), T+V = 3+3 = 6
    // — stable through iter 2, the prune (ab's loss > 0, kept), and
    // the final pass.
    val L = Log2Q16Expr.compute _
    val out = model(Unigram.unigramTrain(docs("ab ab b")))
    assert(out == Map(
      "a" -> ((0L, L(6) - L(1))),
      "b" -> ((1L, L(6) - L(2))),
      "ab" -> ((2L, L(6) - L(3)))), s"got $out")
  }

  test("Viterbi matches brute-force enumeration over all segmentations") {
    val rng = new scala.util.Random(101L)
    val maxLen = 4
    for (trial <- 1 to 200) {
      val word = (1 to (1 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      // vocab: all chars plus a random subset of longer substrings
      val subs = (for {
        s <- 0 until word.length; l <- 2 to math.min(maxLen, word.length - s)
      } yield word.substring(s, s + l)).distinct.filter(_ => rng.nextBoolean())
      val vocab = (('a' to 'c').map(_.toString) ++ subs)
        .map(p => p -> (1L + rng.nextInt(1000)).toLong).toMap
      val lut = new java.util.HashMap[String, java.lang.Long]()
      vocab.foreach { case (p, c) => lut.put(p, c) }
      val pieces = UnigramSegExpr.segment(word, lut, maxLen, Unigram.UnkCostQ16)
      assert(pieces.mkString("") == word, s"trial $trial: pieces must tile the word")
      val gotCost = pieces.map(vocab).sum
      // brute force: all compositions with parts <= maxLen, every part in vocab
      def best(rem: String): Long =
        if (rem.isEmpty) 0L
        else (1 to math.min(maxLen, rem.length)).flatMap { l =>
          vocab.get(rem.substring(0, l)).map(_ + best(rem.substring(l)))
        }.min
      assert(gotCost == best(word),
        s"trial $trial: word=$word got=$gotCost want=${best(word)}")
    }
  }

  test("tie-break: equal-cost candidates resolve to the longer piece") {
    val lut = new java.util.HashMap[String, java.lang.Long]()
    // 'ab' costs exactly a+b: [ab] and [a,b] tie -> longer piece wins
    lut.put("a", 100L); lut.put("b", 200L); lut.put("ab", 300L)
    val pieces = UnigramSegExpr.segment("ab", lut, 4, Unigram.UnkCostQ16)
    assert(pieces.toSeq == Seq("ab"), s"got ${pieces.toSeq}")
  }

  test("UNK fallback: out-of-vocab code points emit verbatim at the pinned cost") {
    val m = Unigram.unigramFit(docs("aa aa"))
    val lut = new java.util.HashMap[String, java.lang.Long]()
    m.costs.foreach { case (p, c) => lut.put(p, c) }
    val pieces = UnigramSegExpr.segment("xy aa", lut, 4, Unigram.UnkCostQ16)
    assert(pieces.take(2).toSeq == Seq("x", "y"), s"got ${pieces.toSeq}")
    assert(pieces.drop(2).mkString("") == "aa")
    // a known piece always beats UNK: cost bound documented at UnkCostQ16
    assert(m.costs.forall(_._2 < Unigram.UnkCostQ16))
  }

  test("code-point discipline: supplementary-plane text segments on cp boundaries") {
    val lut = new java.util.HashMap[String, java.lang.Long]()
    lut.put("a", 10L)
    val s = "𝕏a a" // 𝕏a a — 𝕏 is outside the vocab
    val pieces = UnigramSegExpr.segment(s, lut, 4, Unigram.UnkCostQ16)
    assert(pieces.toSeq == Seq("𝕏", "a", "a"), s"got ${pieces.toSeq}")
  }

  test("prune keeps at most multiKeep multi-char pieces, all chars survive") {
    import graft.sources.Tables
    val d = Tables.documents(spark, sfDir)
    val m = model(Unigram.unigramTrain(d, multiKeep = 6))
    val (chars, multis) = m.keys.partition(p => p.codePointCount(0, p.length) == 1)
    assert(multis.size <= 6, s"multis: $multis")
    assert(chars.nonEmpty)
    // every multi piece's characters are in the vocab (coverage floor)
    val charSet = chars.toSet
    multis.foreach(p => p.foreach(c => assert(charSet(c.toString))))
    // costs are smoothed -log2 probs: positive, below the UNK ceiling
    m.values.foreach { case (cnt, cost) =>
      assert(cnt >= 0 && cost > 0 && cost < Unigram.UnkCostQ16)
    }
  }

  test("encode: piece stream tiles the lowered text; n_pieces consistent") {
    import graft.sources.Tables
    val d = Tables.documents(spark, sfDir)
    val out = Unigram.unigramEncode(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val raw = d.select(col("doc_id"),
        lower(graft.operators.TextOps.wsTrim(coalesce(col("text"), lit("")))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty && out.keySet == raw.keySet)
    out.foreach { case (id, (n, sub)) =>
      assert(sub.replace(" ", "") == raw(id).replaceAll("\\s+", ""),
        s"doc $id: pieces must tile the normalized text")
      assert(n == (if (sub.isEmpty) 0L else sub.split(" ").length.toLong))
    }
  }

  test("deterministic under repartitioning") {
    import graft.sources.Tables
    val d = Tables.documents(spark, sfDir)
    val a = model(Unigram.unigramTrain(d))
    val b = model(Unigram.unigramTrain(d.repartition(7)))
    assert(a == b)
  }
}
