package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q94: MAXIMAL MARGINAL RELEVANCE diversified retrieval (Carbonell &
  * Goldstein, SIGIR 1998) — the re-rank step between "top-k by
  * relevance" and "what a RAG training-data builder actually wants":
  * from each query's BM25 candidate pool, greedily select k results
  * maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected,
  * so near-duplicate hits don't crowd out coverage.
  *
  * Everything stays in the integer domain so the whole greedy trace is
  * hash-exact:
  *  - relevance = q62's Q16 BM25 score (Log2Q16 kernel, no libm);
  *  - inter-candidate similarity = 3-gram shingle Jaccard in myriad
  *    (q25's postings machinery), lifted to Q16 by (jmy·2¹⁶) div 10⁴;
  *  - mmr = 7·rel − 3·maxSim (λ = 0.7 ×10 — scale-free for argmax);
  *  - ties break (mmr DESC, doc_id ASC) via the max_by-over-struct
  *    idiom ↔ row_number in the oracle.
  *
  * The greedy loop is UNROLLED INTO THE PLAN (the q55/q60 fixed-
  * iteration discipline — kSel levels of anti-join + max-sim + argmax,
  * zero driver collects): every level is a keyed join on the
  * checkpointed candidate/similarity frames, so with millions of
  * queries the selection is embarrassingly parallel per query key and
  * each level costs one narrow hash join, never a per-query driver
  * round-trip.
  *
  * Scale shape: candidates are nQueries × candN rows and similarities
  * nQueries × candN² — BOUNDED state, localCheckpoint'd once (the LUT
  * class). The only corpus-sized work is q62's scoring pass and one
  * semi-join of the postings frame against the candidate doc set.
  * Pair similarity is computed per DISTINCT doc pair (docs recurring
  * across queries pay once).
  *
  * Output: (token, step, doc_id, mmr_q16) — the selection trace, step
  * 1..kSel per query token.
  */
object Mmr {

  def mmrDiversify(documents: DataFrame, candN: Int = 12, kSel: Int = 5,
                   shingleN: Int = 3): DataFrame = {
    require(kSel >= 1 && candN >= kSel, "need candN >= kSel >= 1")
    val cand = TextOps.bm25Search(documents, nQueryTerms = 20, k = candN)
      .select(col("token"), col("doc_id"), col("score_q16").as("rel"))
      .localCheckpoint(true) // bounded: nQueries x candN
    val cdocs = cand.select(col("doc_id")).distinct()
    // semi-join BEFORE shingling: only candidate docs (nQueries×candN,
    // broadcast side) ever tokenize — at 100 TB the difference between
    // shingling the corpus and shingling ~200 documents
    val post = Dedup.postings(
        documents.join(broadcast(cdocs), Seq("doc_id"), "left_semi"), shingleN)
      .localCheckpoint(true) // candidate docs only
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val dpair = cand.as("a")
      .join(cand.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val dcom = dpair
      .join(post.select(col("doc_id").as("da"), col("shingle").as("sha")), Seq("da"))
      .join(post.select(col("doc_id").as("db"), col("shingle").as("shb")), Seq("db"))
      .filter(col("sha") === col("shb"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
    val dsim = dpair.join(dcom, Seq("da", "db"), "left").na.fill(0L, Seq("c"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .selectExpr("da", "db", "((10000 * c) DIV (na + nb - c)) AS jmy")
    val sims = dsim.selectExpr("da AS x", "db AS y", "(jmy * 65536) DIV 10000 AS s")
      .unionByName(dsim.selectExpr("db AS x", "da AS y", "(jmy * 65536) DIV 10000 AS s"))
      .localCheckpoint(true) // bounded: nQueries x candN^2 x 2
    var selected: DataFrame = null
    var all: DataFrame = null // (token, doc_id) selected so far
    var t = 1
    while (t <= kSel) {
      val rem =
        if (t == 1) cand else cand.join(all, Seq("token", "doc_id"), "left_anti")
      val scoredRem =
        if (t == 1) rem.withColumn("mmr", col("rel") * 7L)
        else rem
          .join(all.withColumnRenamed("doc_id", "sdoc"), Seq("token"))
          .join(sims, col("doc_id") === col("x") && col("sdoc") === col("y"), "left")
          .groupBy(col("token"), col("doc_id"), col("rel"))
          .agg(max(coalesce(col("s"), lit(0L))).as("ms"))
          .withColumn("mmr", col("rel") * 7L - col("ms") * 3L)
      val pick = scoredRem.groupBy(col("token"))
        .agg(max_by(struct(col("doc_id"), col("mmr")),
          struct(col("mmr"), (-col("doc_id")).as("tb"))).as("w"))
        .select(col("token"), lit(t.toLong).as("step"),
          col("w.doc_id").as("doc_id"), col("w.mmr").as("mmr_q16"))
        .localCheckpoint(true) // nQueries rows — keeps level plans flat
      selected = if (t == 1) pick else selected.unionByName(pick)
      all = selected.select(col("token"), col("doc_id"))
      t += 1
    }
    selected
  }
}
