package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q94 MMR diversified retrieval — the greedy-trace contracts. */
class MmrSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Mmr

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)

  test("q94 trace invariants: kSel steps per query, no repeats, monotone mmr, step1 = BM25 top") {
    val out = Mmr.mmrDiversify(docs).localCheckpoint(true)
    val perTok = out.groupBy("token").agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("nd"),
      max(col("step")).as("smax"))
    assert(perTok.filter(col("n") =!= 5 || col("nd") =!= 5 || col("smax") =!= 5).count() == 0)
    // the selected mmr is non-increasing in step: the candidate set
    // shrinks and the similarity penalty only grows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy("step")
    assert(out.withColumn("prev", lag(col("mmr_q16"), 1).over(w))
      .filter(col("prev").isNotNull && col("mmr_q16") > col("prev")).count() == 0)
    // step 1 is the relevance argmax: exactly BM25 rank 1 (same pool)
    val top1 = graft.operators.TextOps.bm25Search(docs, k = 12)
      .filter(col("rank") === 1).select(col("token"), col("doc_id").as("bdoc"))
    assert(out.filter(col("step") === 1).join(top1, Seq("token"))
      .filter(col("doc_id") =!= col("bdoc")).count() == 0)
  }

  test("q94 diversification: a near-duplicate of the top hit is demoted below a diverse doc") {
    import spark.implicits._
    // qterm appears everywhere; docs 1/2 are near-identical (highest
    // tf), doc 3 is relevant but textually disjoint from them; filler
    // docs establish df >= 5. Pure BM25 ranks 1, 2, 3...; MMR must
    // pick the DIVERSE doc 3 at step 2 because sim(2,1) ~ 1.
    val fill = " fx fy fz fw fv"
    val near = "qterm qterm qterm qterm alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, near + " one"),
      (2L, near + " two"),
      (3L, "qterm qterm qterm unrelated words entirely different content here now"),
      (4L, "qterm pad1" + fill),
      (5L, "qterm pad2" + fill),
      (6L, "qterm pad3" + fill),
      (7L, "qterm pad4" + fill),
      (8L, "qterm pad5" + fill)
    ).toDF("doc_id", "text")
    val trace = Mmr.mmrDiversify(corpus, candN = 6, kSel = 3)
      .filter(col("token") === "qterm")
      .orderBy("step").select("step", "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(trace.nonEmpty, "qterm not among the selected query terms")
    val picks = trace.map(_._2)
    assert(picks.head == 1L || picks.head == 2L, s"step1 should be a near-dup doc: $trace")
    // the twin of the step-1 pick must NOT be step 2
    val twin = if (picks.head == 1L) 2L else 1L
    assert(picks(1) != twin, s"MMR failed to demote the near-duplicate: $trace")
    assert(picks(1) == 3L, s"expected the diverse doc at step 2: $trace")
  }

  test("q94 degenerate: fully disjoint candidates reduce MMR to the BM25 order") {
    import spark.implicits._
    // every doc pair disjoint -> all sims 0 -> trace = relevance order
    val corpus = (0 until 8).map { d =>
      (d.toLong, s"qq qq " + (0 until (8 - d)).map(i => s"w${d}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    val trace = Mmr.mmrDiversify(corpus, candN = 6, kSel = 4)
      .filter(col("token") === "qq")
      .orderBy("step").select("doc_id").as[Long].collect().toSeq
    val bm = graft.operators.TextOps.bm25Search(corpus, k = 6)
      .filter(col("token") === "qq")
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(trace.nonEmpty && trace == bm.take(4),
      s"disjoint corpus should preserve BM25 order: mmr=$trace bm25=$bm")
  }
}
