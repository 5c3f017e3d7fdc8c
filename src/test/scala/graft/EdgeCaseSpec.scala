package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empty-input hardening: every operator must return an empty frame
  * with the right schema — not throw — when a table is empty (a
  * filtered partition at scale IS an empty input somewhere).
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators._
  import graft.sources.Tables

  private def emptyLike(df: DataFrame): DataFrame = df.filter(lit(false))

  lazy val li = Tables.lineitem(spark, sfDir)
  lazy val docs = Tables.documents(spark, sfDir)
  lazy val emb = Tables.embeddings(spark, sfDir)

  test("core + analytics ops survive empty inputs") {
    assert(CoreOps.productStats(emptyLike(li)).count() == 0)
    assert(CoreOps.orderReassembly(emptyLike(li), Tables.part(spark, sfDir)).count() == 0)
    assert(CoreOps.statsMerge(emptyLike(li)).count() == 0)
    assert(Analytics.pricingSummary(emptyLike(li)).count() == 0)
    assert(Analytics.windowRunning(emptyLike(li)).count() == 0)
    assert(Analytics.sessionize(emptyLike(Tables.events(spark, sfDir))).count() == 0)
  }

  test("text + dedup ops survive empty corpora") {
    assert(TextOps.dedupExact(emptyLike(docs)).count() == 0)
    assert(TextOps.vocabulary(emptyLike(docs)).count() == 0)
    assert(TextOps.qualityScore(emptyLike(docs)).count() == 0)
    assert(Dedup.dedupMinHash(emptyLike(docs)).count() == 0)
    assert(Dedup.dedupSimHash(emptyLike(docs)).count() == 0)
    assert(Dedup.ngramJaccard(emptyLike(docs)).count() == 0)
  }

  test("similarity ops survive empty embeddings") {
    assert(Similarity.knnBruteForce(emptyLike(emb)).count() == 0)
    assert(Similarity.knnBruteForceBlocked(emptyLike(emb)).count() == 0)
    assert(Similarity.knnLsh(emptyLike(emb)).count() == 0)
    assert(Similarity.knnIvf(emptyLike(emb)).count() == 0)
    assert(Similarity.knnIvf(emptyLike(emb), lloydIters = 2).count() == 0)
    assert(Similarity.embeddingDedup(emptyLike(emb)).count() == 0)
    assert(Similarity.embeddingDedupLsh(emptyLike(emb)).count() == 0)
  }

  test("round-2 ops survive degenerate inputs") {
    import spark.implicits._
    // single vector: no pairs, no neighbors, codebook smaller than k
    val one = emb.limit(1)
    assert(Similarity.embeddingDedup(one, tau = 0.0).count() == 0)
    assert(Similarity.embeddingDedupLsh(one, tau = 0.0).count() == 0)
    assert(Similarity.knnBruteForceBlocked(one).count() == 0)
    assert(Similarity.trainCodebook(emb.limit(5), nCentroids = 16, iters = 1).count() == 5)
    // stratified sampling: unlisted language strata drop cleanly
    val s = TextOps.stratifiedSample(docs, Map("nope" -> 10000))
    assert(s.count() == 0)
    val all = TextOps.stratifiedSample(docs,
      docs.select("lang").distinct().collect().map(_.getString(0) -> 10000).toMap)
    assert(all.count() == docs.count())
    // streaming minhash signature: blank text degenerates to one shingle
    assert(StreamingDeps.sigLen("") == 32)
    assert(StreamingDeps.sigLen("   \t ") == 32)
    assert(StreamingDeps.sigLen("one two three four") == 32)
  }

  private object StreamingDeps {
    def sigLen(text: String): Int =
      graft.streaming.StreamOps.minhashSignature(text).length
  }

  test("round-4 ops survive empty and degenerate inputs") {
    import spark.implicits._
    val noDocs = emptyLike(docs)
    assert(TextOps.decontaminate(noDocs, docs).count() == 0)
    assert(TextOps.decontaminate(docs, noDocs).filter(col("contaminated") =!= 0L).count() == 0)
    assert(TextOps.repetitionStats(noDocs).count() == 0)
    assert(TextOps.keywords(noDocs).count() == 0)
    assert(Multimodal.audioMeta(noDocs).count() == 0)
    assert(Components.dedupGroups(emptyLike(emb)).count() == 0)
    // a pair-free graph: everyone their own representative
    val lonely = Components.dedupGroups(emb.limit(3), tau = 1.1)
    assert(lonely.filter(col("keep") =!= 1L).count() == 0)
    // streaming decontamination helpers on blank text
    assert(graft.streaming.StreamOps.wordShingleHashes("", 4).size == 1)
    assert(graft.streaming.StreamOps.benchmarkShingleSet(noDocs).isEmpty)
  }

  test("round-6 ops survive empty and degenerate inputs") {
    val noDocs = emptyLike(docs)
    // q46: empty corpus → the full (metric, pct) grid with an EMPTY
    // distribution: n_sample 0, null cutoffs — never NaN, never a throw
    val qg = TextOps.quantileGate(noDocs).collect()
    assert(qg.length == 18)
    assert(qg.forall(r => r.getAs[Long]("n_sample") == 0L && r.isNullAt(r.fieldIndex("cutoff"))))
    // q47: empty corpus and all-blank corpus both pack to nothing
    assert(TextOps.packSequences(noDocs).count() == 0)
    val blank = docs.limit(3).withColumn("text", lit("   "))
    assert(TextOps.packSequences(blank).count() == 0)
    // q47: a single doc fills chunk 0 from offset 0
    val one = TextOps.packSequences(docs.limit(1), capacity = 1000000)
    assert(one.count() == 1 &&
      one.head().getLong(1) == 0L && one.head().getLong(3) == 0L)
    // q48: empty corpus → infeasible → empty; empty target rejected
    assert(TextOps.mixtureSolve(noDocs, Map("en" -> 2000)).count() == 0)
    intercept[IllegalArgumentException] {
      TextOps.mixtureSolve(docs, Map.empty[String, Int])
    }
    intercept[IllegalArgumentException] {
      TextOps.mixtureSolve(docs, Map("en" -> 20000))
    }
    // q48b: empty corpus → infeasible → empty (checkpoint of an
    // empty frame, zero-row rate aggregate)
    assert(TextOps.mixtureSolveTokenized(noDocs, Map("en" -> 2000), Seq("ab")).count() == 0)
    // q52: empty corpus → empty; bad segment width rejected
    assert(TextOps.segmentDedup(noDocs).count() == 0)
    intercept[IllegalArgumentException] { TextOps.segmentDedup(docs, segWords = 0) }
    // q49: empty corpus → empty report; empty benchmark → all clean
    assert(Dedup.decontaminateFuzzy(noDocs, docs).count() == 0)
    val clean = Dedup.decontaminateFuzzy(docs.limit(5), noDocs)
    assert(clean.count() == 5 &&
      clean.filter(col("n_candidates") =!= 0L).count() == 0)
  }

  test("round-9 ops survive empty and degenerate inputs") {
    val noDocs = emptyLike(docs)
    // q58: empty corpus → empty; blank text → zero counts, text echoed
    assert(TextOps.piiRedact(noDocs).count() == 0)
    val blank = docs.limit(2).withColumn("text", lit(" "))
    val pr = TextOps.piiRedact(blank).collect()
    assert(pr.forall(r => r.getLong(1) == 0L && r.getString(4) == " "))
    // q56: empty changelog → empty state
    val noEv = graft.sources.Tables.events(spark, sfDir).limit(0)
    assert(graft.operators.Restore.restoreState(noEv).count() == 0)
  }

  test("round-10 ops survive empty and degenerate inputs") {
    import spark.implicits._
    val noDocs = emptyLike(docs)
    // q61: empty corpus → empty; blank/single-token corpus → zero
    // bigrams everywhere, null ppl (no L(x≤0) evaluation may fire)
    assert(TextOps.perplexity(noDocs).count() == 0)
    val degenerate = Seq((1L, ""), (2L, "  "), (3L, "solo")).toDF("doc_id", "text")
    val pp = TextOps.perplexity(degenerate).collect()
    assert(pp.length == 3 && pp.forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
    // q62: empty corpus → empty; corpus below minDf → no query terms
    assert(TextOps.bm25Search(noDocs).count() == 0)
    assert(TextOps.bm25Search(degenerate).count() == 0)
    // q60/s26: empty embeddings → empty assignment, empty codebook
    assert(Similarity.kmeansAssign(emptyLike(emb)).count() == 0)
    assert(Similarity.kmeansCentroids(emptyLike(emb)).isEmpty)
    // q63: empty → empty with the contract schema; N < k degenerates
    // to singleton clusters (each vector its own centroid) where the
    // nProbe=3 probe set still finds the two other vectors
    val e63 = Similarity.knnIvfInt(emptyLike(emb))
    assert(e63.schema.fieldNames.toSeq == Seq("vec_id", "rank", "neighbor_id", "d2"))
    assert(e63.count() == 0)
    val tiny = Similarity.knnIvfInt(emb.orderBy("vec_id").limit(3)).collect()
    assert(tiny.map(_.getLong(0)).distinct.length == 3)
    assert(tiny.forall(r => r.getLong(3) > 0L || r.getLong(2) != r.getLong(0)))
    assert(tiny.length == 6, "3 queries x 2 probed singleton neighbors")

    // q66 at N < kCoarse (and N < kcode): singleton coarse lists,
    // under-filled codebooks — the probe set still reaches the two
    // other vectors, no self-matches, ranks dense
    val t66 = Similarity.ivfadcSearch(emb.orderBy("vec_id").limit(3)).collect()
    assert(t66.map(_.getLong(0)).distinct.length == 3)
    assert(t66.forall(r => r.getLong(2) != r.getLong(0)), "no self-match")
    assert(t66.length == 6, "3 queries x 2 probed singleton neighbors")
  }

  test("simhash enforces the packed-lane token bound loudly") {
    import graft.functions.SimHashLanes.MaxTokens
    // build the oversized doc executor-side (repeat column, not a 4MB
    // driver literal): MaxTokens+1 single-char tokens
    val over = spark.range(1).select(lit(1L).as("doc_id"),
      repeat(lit("a "), (MaxTokens + 1).toInt).as("text"))
    val ex = intercept[Exception] {
      Dedup.simHashSignatures(over).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("MaxTokens"))), s"got: $ex")
    // exactly at the bound: no error, signature produced
    val at = spark.range(1).select(lit(2L).as("doc_id"),
      repeat(lit("b "), MaxTokens.toInt).as("text"))
    assert(Dedup.simHashSignatures(at).count() == 1)
  }

  test("ops survive blank and single-char text") {
    import spark.implicits._
    val weird = Seq(
      (1L, "", "en", "s", 0L),
      (2L, " ", "en", "s", 1L),
      (3L, "x", "en", "s", 1L),
      (4L, "  \t \n ", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.tokenCount(weird).count() == 4)
    assert(TextOps.docFingerprint(weird).count() == 4)
    assert(TextOps.langId(weird).count() == 4)
    assert(Dedup.dedupMinHash(weird).count() == 4)
    assert(Dedup.dedupSimHash(weird).count() == 4)
    assert(Dedup.ngramJaccard(weird).count() == 4)
    // blank text gets 0 tokens, never negative or null
    val tc = TextOps.tokenCount(weird).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc(1L) == 0L && tc(2L) == 0L && tc(3L) == 1L && tc(4L) == 0L)
  }
}
