package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q99 hybrid RRF retrieval — contracts the DuckDB hash-compare can't
  * see: rank arithmetic, leg semantics on constructed corpora, the
  * scaled-integer-vs-rational fusion-order equivalence, and the probe
  * draw's bound.
  */
class HybridSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Hybrid
  import graft.sources.Tables

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val embs = Tables.embeddings(spark, sfDir)
  private lazy val out = Hybrid.hybridRrf(docs, embs).collect()

  private def mkDocs(rows: Seq[(Long, String)]) = {
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("text", StringType, true),
      StructField("lang", StringType, true),
      StructField("source", StringType, true),
      StructField("n_chars", LongType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        Row(id, t, "en", "src0", Option(t).map(_.length.toLong).getOrElse(0L)) }),
      schema)
  }
  private def mkEmbs(rows: Seq[(Long, Array[Float])]) = {
    val schema = StructType(Seq(StructField("vec_id", LongType, false),
      StructField("embedding", ArrayType(FloatType, false), true),
      StructField("label", IntegerType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v.toSeq, 0) }),
      schema)
  }

  test("registered instance: schema, per-query bounds, contiguous ranks, no self-retrieval") {
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size <= 8, s"more than nQueries=8 probes: ${byQ.size}")
    byQ.foreach { case (qid, rows) =>
      assert(rows.length <= 10)
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"q$qid ranks not contiguous: $ranks")
      rows.foreach(r => assert(r.getLong(2) != qid, s"q$qid retrieved itself"))
      // at least one leg present on every fused row
      rows.foreach(r => assert(!r.isNullAt(4) || !r.isNullAt(5)))
    }
  }

  test("rrf_e6 is exactly the scaled two-leg sum, and rank order follows (rrf DESC, doc_id ASC)") {
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.foreach { r =>
        val lex = if (r.isNullAt(4)) 0L else 1000000L / (60L + r.getLong(4))
        val sem = if (r.isNullAt(5)) 0L else 1000000L / (60L + r.getLong(5))
        assert(r.getLong(3) == lex + sem, s"rrf mismatch on $r")
      }
      val inOrder = rows.sortBy(_.getLong(1))
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2)),
            s"rank order violates (rrf DESC, doc_id ASC): $a then $b")
        case _ => ()
      }
    }
  }

  test("scaled-integer fusion ranks identically to the exact rational RRF on the registered instance") {
    // the doc claim: floor(1e6/(60+r)) separates every distinct
    // rational sum at poolR=20, rrfK=60 — so sorting by the integer
    // equals sorting by the BigDecimal rational, per query
    val mc = new java.math.MathContext(40)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      def rational(r: Row): java.math.BigDecimal = {
        def term(i: Int) = if (r.isNullAt(i)) java.math.BigDecimal.ZERO
          else java.math.BigDecimal.ONE.divide(
            java.math.BigDecimal.valueOf(60L + r.getLong(i)), mc)
        term(4).add(term(5))
      }
      val byInt = rows.sortBy(r => (-r.getLong(3), r.getLong(2))).map(_.getLong(2)).toSeq
      val byRat = rows.sortWith { (x, y) =>
        val c = rational(x).compareTo(rational(y))
        if (c != 0) c > 0 else x.getLong(2) < y.getLong(2)
      }.map(_.getLong(2)).toSeq
      assert(byInt == byRat, s"integer fusion reordered vs rational: $byInt vs $byRat")
    }
  }

  test("lexical leg: an identical-text doc is the top lexical hit (all-probes instance)") {
    val base = "alpha beta gamma delta epsilon zeta"
    val d = mkDocs(Seq(
      0L -> base, 1L -> base,
      2L -> "one two three four five six",
      3L -> "unrelated words entirely different tokens here",
      4L -> "alpha beta something else entirely now"))
    // orthogonal-ish embeddings so the semantic leg can't collide
    val e = mkEmbs((0L to 4L).map { i =>
      val v = new Array[Float](8); v(i.toInt) = 1.0f; i -> v })
    val r = Hybrid.hybridRrf(d, e, nQueries = 5, mTerms = 8, poolR = 4, topK = 4)
      .collect()
    val q0 = r.filter(x => x.getLong(0) == 0L && !x.isNullAt(4))
      .sortBy(_.getLong(4))
    assert(q0.nonEmpty && q0.head.getLong(2) == 1L,
      s"identical-text doc 1 should lead doc 0's lexical list: ${q0.toSeq}")
  }

  test("semantic leg: the nearest embedding is the top semantic hit (all-probes instance)") {
    val d = mkDocs((0L to 3L).map(i => i -> s"filler text number $i"))
    val e = mkEmbs(Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.9f, 0.1f, 0.0f, 0.0f), // nearest to 0
      2L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Array(0.0f, 0.0f, 1.0f, 0.0f)))
    val r = Hybrid.hybridRrf(d, e, nQueries = 4, mTerms = 4, poolR = 3, topK = 3)
      .collect()
    val q0sem = r.filter(x => x.getLong(0) == 0L && !x.isNullAt(5))
      .sortBy(_.getLong(5))
    assert(q0sem.nonEmpty && q0sem.head.getLong(2) == 1L,
      s"vec 1 should lead vec 0's semantic list: ${q0sem.toSeq}")
  }

  test("a doc retrieved by both legs outranks single-leg docs with comparable ranks") {
    // by construction rrf(both legs at ranks a,b) > rrf(one leg at
    // min(a,b)) — verify the property holds on the real output
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val both = rows.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
      val single = rows.filter(r => r.isNullAt(4) ^ r.isNullAt(5))
      for (b <- both; s <- single) {
        val bBest = math.min(b.getLong(4), b.getLong(5))
        val sRank = if (s.isNullAt(4)) s.getLong(5) else s.getLong(4)
        if (bBest <= sRank)
          assert(b.getLong(3) > s.getLong(3),
            s"two-leg doc at best rank $bBest not above one-leg doc at $sRank")
      }
    }
  }

  test("empty corpora yield an empty frame with the contract schema") {
    val r = Hybrid.hybridRrf(mkDocs(Seq.empty), mkEmbs(Seq.empty))
    assert(r.columns.toSeq ==
      Seq("query_id", "rank", "doc_id", "rrf_e6", "lex_rank", "sem_rank"))
    assert(r.count() == 0)
  }

  test("probe draw: probes are exactly the bottom-nQueries by (hash, doc_id) over eligible docs") {
    import graft.functions.{VectorFunctions => VF}
    val P = graft.functions.ReplayableHash.P
    val ha = graft.functions.ReplayableHash.a(Hybrid.ProbeHashIdx)
    val hb = graft.functions.ReplayableHash.b(Hybrid.ProbeHashIdx)
    // the q33/q62 tokenize recipe, restated (tokArrays is operators-private)
    val eligible = docs.select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .join(embs.select(col("vec_id")), col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        ((lit(ha) * VF.poly_hash(concat(lit("q99:"), col("doc_id").cast("string")))
          + lit(hb)) % lit(P)).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == eligible)
  }
}
