package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q67 BPE merge training: value gate is the DuckDB unrolled-CTE
  * oracle; these pin the algorithm against hand replays — the
  * deterministic tie-breaks, the separator-consumption run contract,
  * and partitioning invariance.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Bpe

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def rules(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("hand-replayed micro corpus: counts, ties, and merge order") {
    // words: low x3, lower x2, newest x1
    val out = rules(Bpe.bpeTrain(docs("low low low", "lower lower", "newest"), merges = 5))
    assert(out == Seq(
      (1L, "l", "o", 5L),   // (l,o)=5 ties (o,w)=5 -> lex smallest
      (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L),   // (e,r)=2 ties (low,e)=2 -> 'e' < 'low'
      (4L, "low", "er", 2L),
      (5L, "e", "s", 1L)),  // all-1 tail: lex smallest of newest's pairs
      s"got $out")
  }

  test("run contract: 'aaaa' merges alternately, leftover pair re-learned") {
    // the documented single-pass separator-consumption variant:
    // |a|a|a|a| --(a,a)--> |aa|a|a| (NOT canonical (aa)(aa)); the
    // leftover (a,a) pair is still countable and re-learned at rank 2
    val out = rules(Bpe.bpeTrain(docs("aaaa"), merges = 2))
    assert(out == Seq((1L, "a", "a", 3L), (2L, "a", "a", 1L)), s"got $out")
  }

  test("deterministic under repartitioning") {
    import graft.sources.Tables
    val d = Tables.documents(spark, sfDir)
    val a = rules(Bpe.bpeTrain(d, merges = 8))
    val b = rules(Bpe.bpeTrain(d.repartition(7), merges = 8))
    assert(a == b)
    assert(a.size == 8 && a.map(_._1) == (1L to 8L))
  }

  test("q68 encode: hand corpus segments as trained, reassembly invariant holds") {
    val corpus = docs("low low low", "lower lower", "newest")
    val out = Bpe.bpeEncode(corpus, merges = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // rules (hand-replayed above): l+o, lo+w, e+r, low+er
    assert(out(0) == ((0L, 3L, "low low low")))
    assert(out(1) == ((1L, 2L, "lower lower")))          // low+er merged fully
    assert(out(2)._1 == 2L && out(2)._3.startsWith("n")) // newest stays multi-symbol
    // reassembly: stripping spaces from the subword stream recovers the
    // normalized character stream exactly
    val enc = Bpe.bpeEncode(corpus).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    corpus.collect().foreach { r =>
      val toks = r.getString(1).toLowerCase.trim.split("\\s+").mkString("")
      assert(enc(r.getLong(0)).replace(" ", "") == toks)
    }
    // zero merges = pure character segmentation; merges only shrink
    val n0 = Bpe.bpeEncode(corpus, merges = 0).agg(sum(col("n_subwords"))).collect()(0).getLong(0)
    val n24 = Bpe.bpeEncode(corpus, merges = 24).agg(sum(col("n_subwords"))).collect()(0).getLong(0)
    assert(n0 == corpus.collect().map(_.getString(1).count(!_.isWhitespace)).sum)
    assert(n24 <= n0)
  }

  test("degenerate corpora: empty input and single-char words") {
    val empty = Bpe.bpeTrain(docs().limit(0))
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("rank", "lhs", "rhs", "cnt"))
    // single-char words have no pairs: training stops at zero rules
    assert(Bpe.bpeTrain(docs("a b c a b")).count() == 0)
  }

  test("bpeTrainFast parity: bit-equal to the sequential distributed loop") {
    import graft.sources.Tables
    // the hand corpora exercise ties, the alternating-run leftover,
    // early exhaustion, and empty input
    val corpora = Seq(
      docs("low low low", "lower lower", "newest"),
      docs("aaaa", "aaaaaa aaaa"),
      docs("a b c a b"),
      docs().limit(0))
    corpora.foreach { c =>
      val slow = rules(Bpe.bpeTrain(c, merges = 6))
      val fast = rules(Bpe.bpeTrainFast(c, merges = 6))
      assert(fast == slow, s"fast $fast != sequential $slow")
    }
    // the registered contract on real documents (vocabCap=256,
    // merges=24): rank-for-rank identical rules AND counts
    val d = Tables.documents(spark, sfDir)
    val slow = rules(Bpe.bpeTrain(d))
    val fast = rules(Bpe.bpeTrainFast(d))
    assert(fast == slow)
    // production-merges depth: greedy training is prefix-stable, so a
    // 96-merge fast run's first 24 rules must equal the sequential
    // 24-merge run at the same vocabCap — and the deep tail stays
    // rank-dense
    val deep = rules(Bpe.bpeTrainFast(d, vocabCap = 512, merges = 96))
    assert(deep.take(24) == rules(Bpe.bpeTrain(d, vocabCap = 512, merges = 24)))
    assert(deep.size <= 96 && deep.map(_._1) == (1L to deep.size.toLong))
    // exhaustion behavior identical: tiny corpus runs dry at the same rank
    val tiny = docs("ab ab cd")
    assert(rules(Bpe.bpeTrainFast(tiny, merges = 24)) ==
      rules(Bpe.bpeTrain(tiny, merges = 24)))
  }
}
