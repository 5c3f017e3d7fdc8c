package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q102 RAG chain: the value gate is the DuckDB chain oracle; these
  * pin the contracts the hash-compare can't see — chunk-boundary
  * answers stay retrievable (the overlap guarantee), passage→doc
  * attribution, self-exclusion, and doc-level dedup of results.
  */
class RagSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Rag
  import graft.sources.Tables

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("chunk-boundary answers are retrievable: the straddling phrase lives whole in an overlap passage") {
    // 96-word doc; the distinctive trigram sits at positions 63-65 —
    // ACROSS the first window boundary (window 64, stride 32): chunk 0
    // holds words 1-64 (zebra, quagga but NOT okapi), chunk 1 holds
    // words 33-96 with the whole phrase. Without overlap the phrase
    // would exist in no passage.
    val planted = (1 to 62).map(i => s"w$i").mkString(" ") +
      " zebra quagga okapi " + (66 to 96).map(i => s"w$i").mkString(" ")
    val filler = (1 to 80).map(i => s"f$i").mkString(" ")
    val corpus = docs((1000L, planted), (1L, filler), (2L, filler + " zebra"))
    val out = Rag.ragLexical(corpus,
        Seq((-1L, Seq("zebra", "quagga", "okapi"))), poolR = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.nonEmpty && out.head._2 == 1000L,
      s"the doc holding the whole phrase must rank first: ${out.toSeq}")
    val passage = graft.operators.TextOps.chunkPassages(
        corpus.filter(col("doc_id") === 1000L))
      .filter(col("chunk_id") === out.head._3)
      .collect()(0).getString(3)
    assert(Seq("zebra", "quagga", "okapi").forall(passage.contains),
      s"attributed passage must contain the WHOLE straddling phrase: $passage")
    assert(out.head._3 == 1L, "the phrase straddles chunk 0's boundary; chunk 1 holds it")
  }

  test("registered instance: self-exclusion, doc dedup, attribution, rank and rrf arithmetic") {
    val out = Rag.ragSearch(Tables.documents(spark, sfDir),
        Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long])))
    assert(out.nonEmpty)
    // self-exclusion — lifted to passage granularity: the probe's own
    // doc never appears, via either leg
    assert(out.forall { case (q, _, d, _, _, _, _) => q != d },
      "a query document must never retrieve itself")
    // doc-level dedup: one row per (query, doc)
    val keys = out.map(r => (r._1, r._3))
    assert(keys.distinct.length == keys.length, "doc appears twice in one result list")
    // ranks contiguous from 1 per query
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length), s"ranks of $q broken")
    }
    // attribution: passage_id present exactly when the lexical leg
    // retrieved the doc; rrf is exactly the two-leg integer sum
    out.foreach { case (_, _, _, pid, rrf, lex, sem) =>
      assert(pid.isDefined == lex.isDefined,
        "passage attribution must accompany exactly the lexical retrievals")
      val want = lex.map(r => 1000000L / (60L + r)).getOrElse(0L) +
        sem.map(r => 1000000L / (60L + r)).getOrElse(0L)
      assert(rrf == want, s"rrf_e6 $rrf != $want")
    }
    // attributed passages exist in the chunking of their doc
    val maxChunk = graft.operators.TextOps.chunkPassages(
        Tables.documents(spark, sfDir).select(col("doc_id"),
          graft.operators.TextOps.normalizeCol(col("text")).as("text")))
      .groupBy(col("doc_id")).agg(max(col("chunk_id")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (_, _, d, pid, _, _, _) =>
      pid.foreach(p => assert(p >= 0 && p <= maxChunk(d),
        s"passage $p outside doc $d's chunk range"))
    }
  }

  test("deterministic under repartitioning") {
    val d = Tables.documents(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val a = Rag.ragSearch(d, e).collect().map(_.toSeq).toSet
    val b = Rag.ragSearch(d.repartition(7), e.repartition(5)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
