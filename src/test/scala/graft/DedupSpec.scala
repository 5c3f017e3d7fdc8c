package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Planted-duplicate tests for the fuzzy dedup operators (q25–q27):
  * clone a slice of the corpus under new doc_ids and require each
  * algorithm to find the planted pairs (exact copies ⇒ Jaccard 1.0,
  * Hamming 0 — must be caught at any reasonable threshold).
  */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dedup
  import graft.sources.Tables

  lazy val docs = Tables.documents(spark, sfDir)
  /** Corpus with ids 0..n-1 plus exact clones of the first 10 docs. */
  lazy val planted = {
    val clones = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 100000)
    docs.unionAll(clones)
  }

  test("q49 fuzzy decontamination flags planted bench copies with attribution") {
    // bench = first 5 docs; corpus = the rest PLUS exact copies of the
    // bench docs under fresh ids — the planted contamination
    val bench = docs.filter(col("doc_id") < 5)
    val copies = bench.withColumn("doc_id", col("doc_id") + 200000)
    val corpus = docs.filter(col("doc_id") >= 5).unionAll(copies)
    val out = Dedup.decontaminateFuzzy(corpus, bench)
    out.persist()
    try {
      // one row per corpus doc; counts consistent; jaccard in [0, 1]
      assert(out.count() == corpus.count())
      assert(out.filter(col("n_contaminated") > col("n_candidates")).count() == 0)
      assert(out.filter(col("worst_jaccard") < 0.0 || col("worst_jaccard") > 1.0).count() == 0)
      // every planted copy is caught (identical docs share ALL bands —
      // recall 1 by construction), at jaccard exactly 1.0, attributed
      // to its source bench doc
      val caught = out.filter(col("doc_id") >= 200000).collect()
      assert(caught.length == 5)
      caught.foreach { r =>
        assert(r.getAs[Long]("n_contaminated") >= 1, r.toString)
        assert(r.getAs[Double]("worst_jaccard") == 1.0, r.toString)
        assert(r.getAs[Long]("worst_bench") == r.getAs[Long]("doc_id") - 200000, r.toString)
      }
      // untouched docs exist and dominate (the flagging is selective)
      assert(out.filter(col("n_contaminated") === 0).count() >
        out.filter(col("n_contaminated") > 0).count())
      // deterministic under repartitioning
      assertSameRows(out, Dedup.decontaminateFuzzy(corpus.repartition(13), bench))
    } finally out.unpersist()
  }

  test("q25 minhash finds every planted exact duplicate") {
    val out = Dedup.dedupMinHash(planted)
    assert(out.count() == planted.count())
    val dupIds = out.filter(col("n_dups") >= 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    for (i <- 0 until 10) {
      assert(dupIds.contains(i.toLong), s"doc $i not flagged")
      assert(dupIds.contains(i + 100000L), s"clone of $i not flagged")
    }
  }

  test("q25 minhash on a dup-free corpus flags nothing at tau=1.0") {
    val out = Dedup.dedupMinHash(docs, tau = 1.0)
    assert(out.filter(col("n_dups") > 0).count() == 0)
  }

  test("q26 simhash: clones get identical signatures and n_near >= 1") {
    val out = Dedup.dedupSimHash(planted)
    val sig = out.select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until 10) {
      assert(sig(i.toLong) == sig(i + 100000L), s"sig mismatch for $i")
    }
    val near = out.filter(col("n_near") >= 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    for (i <- 0 until 10) assert(near.contains(i.toLong) && near.contains(i + 100000L))
  }

  /** Corpus with NEAR-duplicates (not exact copies): clones of the
    * first 20 docs with 1–3 filler words appended — shingle Jaccard
    * lands high but below 1.0, so banding has to actually work.
    */
  lazy val perturbed = {
    val filler = concat(col("text"), lit(" zz1"),
      when(col("doc_id") % 3 >= 1, lit(" zz2")).otherwise(lit("")),
      when(col("doc_id") % 3 === 2, lit(" zz3")).otherwise(lit("")))
    val clones = docs.filter(col("doc_id") < 20)
      .withColumn("text", filler)
      .withColumn("doc_id", col("doc_id") + 100000)
    docs.unionAll(clones)
  }

  test("q25 recall gate: banded candidates cover >= 90% of exact Jaccard pairs") {
    val exact = Dedup.exactJaccardPairs(perturbed, shingleN = 3, tau = 0.5)
      .select("id_a", "id_b")
    val nExact = exact.count()
    assert(nExact >= 20, s"perturbation too strong: only $nExact exact pairs")
    val found = Dedup.minHashPairs(perturbed)
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
    // verified candidates are exact-Jaccard-scored, so they must be a
    // subset of ground truth...
    assert(found.exceptAll(exact).count() == 0)
    // ...and banding must not lose more than 10% of true pairs
    val recall = found.intersect(exact).count().toDouble / nExact
    assert(recall >= 0.9, s"recall $recall over $nExact pairs")
  }

  test("q26 pigeonhole blocking finds EXACTLY the brute-force Hamming pairs") {
    val sigs = Dedup.simHashSignatures(perturbed)
    val a = sigs.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
      .select("id_a", "id_b")
    // Hamming <= 3 over 4 chunks leaves one chunk untouched, so chunk
    // blocking is lossless by construction: recall is exactly 1
    assertSameRows(Dedup.simHashNearPairs(perturbed, maxDist = 3), brute)
    assert(brute.count() >= 1, "perturbed corpus should contain Hamming-near pairs")
  }

  test("q27 ngram jaccard: planted clone is the best neighbor at 1.0") {
    val out = Dedup.ngramJaccard(planted)
    val best = out.filter(col("doc_id") < 10)
      .select("doc_id", "best_neighbor", "best_jaccard").collect()
    for (r <- best) {
      assert(!r.isNullAt(1), s"doc ${r.getLong(0)} has no neighbor")
      assert(r.getDouble(2) == 1.0, s"doc ${r.getLong(0)} best_jaccard ${r.getDouble(2)}")
    }
  }

  test("q27 output covers every doc and jaccard within [0,1]") {
    val out = Dedup.ngramJaccard(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("best_jaccard") < 0 || col("best_jaccard") > 1).count() == 0)
  }

  // -- q91 winnowing --------------------------------------------------

  private def winnowKernel(toks: Seq[String], k: Int = 4, w: Int = 4): Seq[(Long, Int)] = {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
    val out = graft.functions.WinnowSetExpr.winnow(arr, k, w)
    (0 until out.numElements()).map { i =>
      val p = out.getLong(i)
      (p >> graft.functions.WinnowSetExpr.PosBits, (p & ((1 << 21) - 1)).toInt)
    }
  }

  test("q91 kernel: the winnowing guarantee — every w-window of grams has a selection") {
    // pseudo-random but deterministic token stream
    val toks = (0 until 400).map(i => s"t${(i * 2654435761L) % 97}")
    val k = 4; val w = 4
    val m = toks.length - k + 1
    val sels = winnowKernel(toks, k, w)
    val positions = sels.map(_._2).toSet
    (1 to (m - w + 1)).foreach { j =>
      assert((j until j + w).exists(positions.contains),
        s"window starting at gram $j has no selected fingerprint")
    }
    // density: expected 2/(w+1) = 0.4 of grams; allow generous slack
    assert(sels.size <= (0.6 * m).toInt && sels.size >= (0.2 * m).toInt,
      s"selected ${sels.size} of $m grams — outside the winnowing density band")
  }

  test("q91 kernel: rightmost-minimum tie rule and record-when-new dedup") {
    // identical tokens -> every gram hash equal -> each window's min is
    // its RIGHTMOST gram; selections advance one gram per window
    val sels = winnowKernel(Seq.fill(12)("same"), k = 4, w = 4)
    val m = 12 - 4 + 1 // 9 grams, windows at j=1..6
    assert(sels.map(_._2) == (4 to m).toList, s"got positions ${sels.map(_._2)}")
    assert(sels.map(_._1).distinct.size == 1)
    // short doc: < k tokens -> one truncated gram; < w grams -> one window
    assert(winnowKernel(Seq("a", "b"), k = 4, w = 4).size == 1)
  }

  test("q91 pairs: planted shared run is caught; ubiquitous fingerprints are capped out") {
    import spark.implicits._
    // two docs sharing a 16-token run (>= w+k-1 = 7 guarantee bound),
    // disjoint elsewhere — must pair with n_shared >= 2
    val shared = (0 until 16).map(i => s"run${(i * 7919) % 89}").mkString(" ")
    val a = (0 until 40).map(i => s"alpha${i * 13 % 61}").mkString(" ") + " " + shared
    val b = shared + " " + (0 until 40).map(i => s"beta${i * 17 % 59}").mkString(" ")
    val noise = (0 until 30).map { d =>
      (1000L + d, (0 until 50).map(i => s"n${d}x${(i * 31 + d * 7) % 83}").mkString(" "))
    }
    val corpus = (Seq((1L, a), (2L, b)) ++ noise).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(corpus)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2),
      s"planted 16-token shared run not caught: $pairs")

    // 12 identical docs: every fingerprint has df=12 > maxDf=10 -> the
    // MOSS ubiquity cap drops them all, no pairs reported
    val dup = (0 until 12).map(d => (2000L + d, a)).toDF("doc_id", "text")
    assert(Dedup.winnowPairs(dup.unionAll(corpus.filter(col("doc_id") >= 1000L))).count() == 0)
  }
}
