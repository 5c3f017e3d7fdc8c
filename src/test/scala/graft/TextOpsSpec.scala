package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the text-analysis operators (SURVEY.md §2 q20–q24).
  * The value-level gate is the driver's DuckDB compare; these pin the
  * semantic properties that must hold regardless of engine.
  */
class TextOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.TextOps
  import graft.sources.Tables

  lazy val docs = Tables.documents(spark, sfDir)

  test("q20 dedup groups partition the corpus: sum(n_dups) == total docs") {
    val out = TextOps.dedupExact(docs)
    val total = out.agg(sum("n_dups")).head().getLong(0)
    assert(total == docs.count())
    // canonical doc_id is a real doc id
    assert(out.join(docs, "doc_id").count() == out.count())
  }

  test("q20 dedup is idempotent on already-unique canonical docs") {
    val canon = TextOps.dedupExact(docs).select("doc_id").join(docs, "doc_id")
    val again = TextOps.dedupExact(canon)
    assert(again.count() == canon.count())
    assert(again.filter(col("n_dups") > 1).count() == 0)
  }

  test("q21 fingerprints are deterministic and collision-free on distinct text") {
    val fp = TextOps.docFingerprint(docs)
    val distinctTexts = docs.select("text").distinct().count()
    assert(fp.select("fp_md5").distinct().count() == distinctTexts)
    // same text twice => same fingerprint (self-union)
    val doubled = TextOps.docFingerprint(docs.unionAll(docs))
    assert(doubled.select("fp_md5", "fp_poly").distinct().count() == distinctTexts)
  }

  test("q22 token counts: bpe >= ws tokens (regex splits punctuation out)") {
    val out = TextOps.tokenCount(docs)
    assert(out.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
    assert(out.filter(col("ws_tokens") <= 0).count() == 0)
  }

  test("q23 quality ratios are all within [0,1]") {
    val out = TextOps.qualityScore(docs)
    for (c <- Seq("alpha_ratio", "punct_ratio", "stopword_ratio"))
      assert(out.filter(col(c) < 0 || col(c) > 1).count() == 0, c)
  }

  test("q33 vocabulary: tf sums to the token count, df bounded by corpus size") {
    val out = TextOps.vocabulary(docs, topK = 1000000)
    val totalTf = out.agg(sum("tf")).head().getLong(0)
    val totalTokens = TextOps.tokenCount(docs).agg(sum("ws_tokens")).head().getLong(0)
    assert(totalTf == totalTokens)
    val n = docs.count()
    assert(out.filter(col("df") > n || col("df") < 1).count() == 0)
    assert(out.filter(col("df") > col("tf")).count() == 0)
  }

  test("q24 lang_id emits one deterministic prediction per doc") {
    val out = TextOps.langId(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("pred_lang").isNull).count() == 0)
    // deterministic across runs
    val again = TextOps.langId(docs)
    assertSameRows(out, again)
  }

  test("q37 stratified sample: rate-exact strata, deterministic, repartition-stable") {
    val rates = Map("en" -> 10000, "es" -> 5000, "de" -> 2500, "fr" -> 1250, "zh" -> 625)
    val out = TextOps.stratifiedSample(docs, rates)
    // rate 10000 keeps everything; rate 0 (unlisted strata) keeps nothing
    val en = docs.filter(col("lang") === "en").count()
    assert(out.filter(col("lang") === "en").count() == en)
    // per-stratum empirical rate within 4 binomial sigma of the target
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, r) <- rates if lang != "en"; n <- counts.get(lang)) {
      val kept = out.filter(col("lang") === lang).count()
      val p = r / 10000.0
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(kept - n * p) <= 4 * sigma + 1,
        s"$lang kept $kept of $n at rate $p")
    }
    // determinism: identical under a different partitioning (the property
    // df.sample does NOT have)
    assertSameRows(out, TextOps.stratifiedSample(docs.repartition(13), rates))
  }

  test("q38 decontamination flags a doc copying benchmark text, not a disjoint one") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma delta epsilon and more"), // contains a bench 4-gram
      (2L, "totally different vocabulary nothing shared here at all"),
      (3L, "alpha beta gamma delta")) // exactly one bench 4-gram
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(corpus, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._2 == 1L && out(1L)._1 >= 2L, s"doc 1: ${out(1L)}")
    assert(out(2L) == ((0L, 0L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((1L, 1L)), s"doc 3: ${out(3L)}")
    // one row per corpus doc, benchmark docs excluded from the output
    assert(TextOps.decontaminate(corpus, bench).count() == 3)
    // corpus-side full table: every doc present exactly once
    val full = TextOps.decontaminate(docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
    assert(full.count() == docs.filter(col("doc_id") % 97 =!= 0).count())
  }

  test("q73 bloom decontamination is frame-identical to exact q38") {
    import spark.implicits._
    // hand corpus: a copier, a disjoint doc, an exact-one-gram doc
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma delta epsilon and more"),
      (2L, "totally different vocabulary nothing shared here at all"),
      (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val exact = TextOps.decontaminate(corpus, bench)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val bloom = TextOps.decontaminateBloom(corpus, bench)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(bloom.toSeq == exact.toSeq)
    // the real corpus split: identical frames (FPs all die in the
    // confirm join) — this is the operator's whole contract
    val c = docs.filter(col("doc_id") % 97 =!= 0)
    val b = docs.filter(col("doc_id") % 97 === 0)
    val full = TextOps.decontaminateBloom(c, b)
    assert(full.count() == c.count())
    assert(full.exceptAll(TextOps.decontaminate(c, b)).count() == 0)
    // tiny bitsPerItem (2) floods the prefilter with FPs — output
    // must STILL be exact (the confirm join is the correctness gate)
    val flood = TextOps.decontaminateBloom(corpus, bench, bitsPerItem = 2)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(flood.toSeq == exact.toSeq)
  }

  test("q81 contamination report: per-benchmark dirty-doc and hit-shingle accounting") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"), // copied below
      (200L, "unique benchmark phrasing never appearing in any corpus doc"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma delta epsilon and more"),
      (2L, "totally different vocabulary nothing shared here at all"),
      (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = TextOps.contaminationReport(corpus, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bench 100 (5 shingles): docs 1 and 3 both overlap it; doc 1 hits
    // "alpha beta gamma delta" + "beta gamma delta epsilon", doc 3 the
    // first only -> 2 distinct hit shingles, 2 dirty docs, not clean
    assert(out(100L) == ((5L, 2L, 2L, 0L)), s"bench 100: ${out(100L)}")
    // bench 200 (6 shingles): disjoint -> clean, zero hits
    assert(out(200L) == ((6L, 0L, 0L, 1L)), s"bench 200: ${out(200L)}")
    // one row per benchmark item; consistency with q38 on the real split:
    // some corpus doc is contaminated iff some bench item is dirty
    val c = docs.filter(col("doc_id") % 97 =!= 0)
    val b = docs.filter(col("doc_id") % 97 === 0)
    val rep = TextOps.contaminationReport(c, b)
    assert(rep.count() == b.count())
    val anyDirty = rep.filter(col("n_dirty_docs") > 0).count() > 0
    val anyContam = TextOps.decontaminate(c, b).filter(col("contaminated") === 1).count() > 0
    assert(anyDirty == anyContam)
    // hit shingles never exceed the item's shingle count
    assert(rep.filter(col("n_hit_shingles") > col("n_shingles")).count() == 0)
    // determinism under repartition
    assertSameRows(rep, TextOps.contaminationReport(c.repartition(13), b.repartition(7)))
  }

  test("q83 dataset diff: added/removed/changed/unchanged by content digest, null-text aware") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, null: String), (4L, "delta"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, "alpha"), (2L, "beta CHANGED"), (3L, null: String), (5L, "echo"))
      .toDF("doc_id", "text")
    val out = TextOps.datasetDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null text exists in both: presence flags, not digest nullness
      4L -> "removed", 5L -> "added"), out.toString)
    // a null text replaced by real text is CHANGED, not added
    val neu2 = Seq((3L, "now present")).toDF("doc_id", "text")
    assert(TextOps.datasetDiff(old, neu2).filter(col("doc_id") === 3L)
      .head().getString(1) == "changed")
    // registered derivation: every %17 doc removed, every shifted id
    // added, untouched residues unchanged
    val full = graft.SparkEntry.queries("q83_dataset_diff")(spark, sfDir)
      .localCheckpoint(true)
    assert(full.filter(col("status") === "removed")
      .filter(col("doc_id") % 17 =!= 0).count() == 0)
    assert(full.filter(col("status") === "added")
      .filter(col("doc_id") < 10000000L).count() == 0)
    assert(full.filter(col("doc_id") % 17 =!= 0 && col("doc_id") % 13 =!= 0
      && col("doc_id") < 10000000L && col("status") =!= "unchanged").count() == 0)
    // one row per doc_id across both snapshots
    assert(full.groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0)
    assertSameRows(TextOps.datasetDiff(old.repartition(7), neu.repartition(3)),
      TextOps.datasetDiff(old, neu))
  }

  test("q84 memorization risk: corpus-repeated shingles drive the ratio, unique text scores 0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // shares its first 4-gram with doc 2
      (2L, "alpha beta gamma delta different end"),
      (3L, "totally unique vocabulary nothing shared here at all"),
      (4L, null: String))
      .toDF("doc_id", "text")
    val out = TextOps.memorizationRisk(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // doc 1: 2 shingles, 1 repeated ("alpha beta gamma delta") -> 0.5
    assert(out(1L) == ((2L, 1L, 0.5)), s"doc 1: ${out(1L)}")
    // doc 2: 3 shingles, 1 repeated
    assert(out(2L)._1 == 3L && out(2L)._2 == 1L, s"doc 2: ${out(2L)}")
    // unique doc scores 0; null text has no shingles and a NULL ratio
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    assert(out(4L) == ((0L, 0L, null)), s"doc 4: ${out(4L)}")
    // corpus-level sanity: one row per doc, ratio within [0, 1]
    val full = TextOps.memorizationRisk(docs).localCheckpoint(true)
    assert(full.count() == docs.count())
    assert(full.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    assert(full.filter(col("n_dup") > col("n_shingles")).count() == 0)
    assertSameRows(full, TextOps.memorizationRisk(docs.repartition(13)))
  }

  test("q85 passage chunking: full coverage with overlap, verbatim text, tail shorter") {
    import spark.implicits._
    // 10 words, window 4, stride 2 -> k = 1 + ceil(6/2) = 4 chunks
    val doc = Seq((1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), (2L, null: String),
      (3L, "short text")).toDF("doc_id", "text")
    val out = TextOps.chunkPassages(doc, window = 4, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(out((1L, 0L)) == ((4L, "w0 w1 w2 w3")))
    assert(out((1L, 1L)) == ((4L, "w2 w3 w4 w5")))
    assert(out((1L, 2L)) == ((4L, "w4 w5 w6 w7")))
    assert(out((1L, 3L)) == ((4L, "w6 w7 w8 w9")))
    assert(!out.contains((1L, 4L)))
    // shorter-than-window doc: one whole-doc chunk; null text: none
    assert(out((3L, 0L)) == ((2L, "short text")))
    assert(!out.keys.exists(_._1 == 2L))
    // coverage invariant on the corpus: every token index lands in
    // some chunk — total words == len for stride == window (disjoint),
    // and >= len with overlap
    val full = TextOps.chunkPassages(docs).localCheckpoint(true)
    val lens = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(graft.operators.TextOps.wsTrim(col("text")), "\\s+")).as("len"))
    val sums = full.groupBy(col("doc_id")).agg(sum(col("n_words")).as("s"),
      max(col("chunk_id")).as("mx"))
      .join(lens, "doc_id")
    assert(sums.filter(col("s") < col("len")).count() == 0, "tokens dropped")
    // last chunk starts before the text ends (no fully-empty tail)
    assert(full.filter(col("n_words") <= 0).count() == 0)
    assertSameRows(full, TextOps.chunkPassages(docs.repartition(13)))
  }

  test("q88 source mix: cube marginals consistent, total share is exactly one myriad") {
    val out = TextOps.sourceMix(docs).localCheckpoint(true)
    val tot = out.filter(col("source") === "__total__" && col("lang") === "__total__")
    assert(tot.count() == 1)
    val t = tot.head()
    assert(t.getLong(4) == 10000L, "corpus total share must be exactly one myriad")
    // marginals: per-source rows sum (docs AND tokens) to the total row
    val bySrc = out.filter(col("source") =!= "__total__" && col("lang") === "__total__")
    assert(bySrc.agg(sum(col("n_docs"))).head().getLong(0) == t.getLong(2))
    assert(bySrc.agg(sum(col("n_tokens"))).head().getLong(0) == t.getLong(3))
    // cells sum to their source marginal
    val cells = out.filter(col("source") =!= "__total__" && col("lang") =!= "__total__")
      .groupBy(col("source")).agg(sum(col("n_docs")).as("d"), sum(col("n_tokens")).as("nt"))
    val bad = cells.join(bySrc.select(col("source"), col("n_docs"), col("n_tokens")), "source")
      .filter(col("d") =!= col("n_docs") || col("nt") =!= col("n_tokens"))
    assert(bad.count() == 0)
    // shares within [0, 10000] and monotone with token mass
    assert(out.filter(col("share_myriad") < 0 || col("share_myriad") > 10000).count() == 0)
    assertSameRows(out, TextOps.sourceMix(docs.repartition(13)))
  }

  test("q74 ccnet buckets: per-lang monotone partition, nulls attributable") {
    val out = TextOps.ccnetBuckets(docs, k = 256)
    // one row per document
    assert(out.count() == docs.count())
    // a doc has a bucket iff it has a perplexity
    assert(out.filter(col("ppl_q16").isNull =!= col("bucket").isNull).count() == 0)
    // within every language the buckets are a MONOTONE partition:
    // max(head) <= min(middle) <= max(middle) <= min(tail)
    val stats = out.filter(col("bucket").isNotNull)
      .groupBy(col("lang"), col("bucket"))
      .agg(min(col("ppl_q16")).as("lo"), max(col("ppl_q16")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val langs = stats.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    for (l <- langs) {
      val hi = stats.get((l, "head")).map(_._2)
      val mLo = stats.get((l, "middle")).map(_._1)
      val mHi = stats.get((l, "middle")).map(_._2)
      val tLo = stats.get((l, "tail")).map(_._1)
      for (h <- hi; m <- mLo) assert(h <= m, s"$l head/middle overlap")
      for (m <- mHi; t <- tLo) assert(m <= t, s"$l middle/tail overlap")
    }
    // on the real corpus every major language has all three buckets
    // and the head share sits near a third (sketch cutoffs, not exact)
    val byLang = out.filter(col("bucket").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val major = byLang.filter(_._2 >= 50).keys
    assert(major.nonEmpty)
    for (l <- major) {
      val n = byLang(l).toDouble
      val h = stats.get((l, "head")).map(_._3).getOrElse(0L).toDouble
      assert(stats.contains((l, "middle")) && stats.contains((l, "tail")), s"$l missing a bucket")
      assert(h / n > 0.15 && h / n < 0.55, s"$l head share ${h / n}")
    }
    // degenerate docs (under 2 tokens) bucket to null, not a crash
    import spark.implicits._
    val tiny = Seq((1L, "en", "solo"), (2L, "en", ""), (3L, "en", "two words here"))
      .toDF("doc_id", "lang", "text")
    val t = TextOps.ccnetBuckets(tiny, k = 16).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(t(1L).isEmpty && t(2L).isEmpty && t(3L).nonEmpty)
    // deterministic under repartitioning
    val again = TextOps.ccnetBuckets(docs.repartition(7), k = 256)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("q75 normalization: composed/decomposed unify, invisibles strip, ascii intact") {
    import spark.implicits._
    val d = Seq(
      (1L, "caf" + "e\u0301" + "  x"),  // decomposed + double space
      (2L, "caf\u00E9 x"),              // composed, already canonical
      (3L, "a\u200Bb\u0007c"),          // zero-width + control
      (4L, "  plain   text  "),         // whitespace only
      (5L, null.asInstanceOf[String]),  // null stays null
      (6L, "clean"))                    // nothing to do
      .toDF("doc_id", "text")
    val out = TextOps.normalizeText(d).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3)))).toMap
    // the dedup-unification property this stage exists for: the
    // decomposed and composed spellings normalize to the SAME bytes
    assert(out(1L)._1 == out(2L)._1, s"${out(1L)} vs ${out(2L)}")
    assert(out(1L)._1.contains("caf\u00E9 x"))
    assert(out(1L)._3 == 1L && out(2L)._3 == 0L)
    assert(out(3L) == ((Some("abc"), Some(2L), 1L)))
    assert(out(4L) == ((Some("plain text"), Some(0L), 1L)))
    assert(out(5L) == ((None, None, 0L)))
    assert(out(6L) == ((Some("clean"), Some(0L), 0L)))
    // kernel fast path: full-ASCII input passes through byte-identical
    val k = d.filter(col("doc_id") === 6L)
      .select(graft.functions.VectorFunctions.nfc_normalize(col("text")))
      .head().getString(0)
    assert(k == "clean")
    // on the real (ASCII) corpus nothing is removed and the operator
    // emits one row per doc
    val full = TextOps.normalizeText(docs)
    assert(full.count() == docs.count())
    assert(full.filter(col("n_removed") > 0).count() == 0)
  }

  test("q76 corpus card: total row is the column-sum of the language rows") {
    val out = TextOps.corpusCard(docs, k = 256).collect()
      .map(r => r.getString(0) -> r).toMap
    val langRows = out.filter(_._1 != "__total__").values
    val tot = out("__total__")
    // the rollup total is exactly the sum of its parts
    assert(langRows.map(_.getLong(1)).sum == tot.getLong(1)) // n_docs
    assert(langRows.map(_.getLong(3)).sum == tot.getLong(3)) // n_tokens
    assert(langRows.map(_.getLong(4)).sum == tot.getLong(4)) // n_chars
    assert(tot.getLong(1) == docs.count())
    // percentiles ordered and inside the observed range per lang
    for (r <- out.values; if r.getLong(2) > 0) {
      val (p50, p90) = (r.getLong(6), r.getLong(7))
      assert(p50 <= p90, s"${r.getString(0)}: $p50 > $p90")
      assert(p50 > 0)
      // mean tokens is a plausible integer (tokens <= chars)
      assert(r.getLong(5) <= r.getLong(4) / math.max(r.getLong(2), 1L))
    }
    // null text: counted in n_docs, absent from n_text and the sums
    import spark.implicits._
    val d = Seq((1L, "en", "five words of plain text"),
      (2L, "en", null.asInstanceOf[String]), (3L, "fr", "deux mots"))
      .toDF("doc_id", "lang", "text")
    val card = TextOps.corpusCard(d, k = 16).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card("en").getLong(1) == 2L && card("en").getLong(2) == 1L)
    assert(card("en").getLong(3) == 5L)
    assert(card("fr").getLong(3) == 2L)
    assert(card("__total__").getLong(1) == 3L && card("__total__").getLong(3) == 7L)
  }

  test("q39 repetition stats separate a repetitive doc from a varied one") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam spam spam"), // one token repeated
      (2L, "one two three four five six"),   // all distinct
      (3L, ""), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // repetitive: distinct ratio 1/6, ALL 2-grams identical, all 3-grams dups
    assert(out(1L).getDouble(3) == 1.0 / 6.0)
    assert(out(1L).getDouble(4) == 1.0)
    assert(out(1L).getDouble(5) == 1.0)
    // varied: distinct ratio 1.0, every gram unique
    assert(out(2L).getDouble(3) == 1.0)
    assert(out(2L).getDouble(4) == 1.0 / 5.0)
    assert(out(2L).getDouble(5) == 0.0)
    // empty + single-token degenerate rows exist with zero ratios
    assert(out(3L).getLong(1) == 0L && out(3L).getDouble(3) == 0.0)
    assert(out(4L).getLong(1) == 1L && out(4L).getDouble(4) == 0.0)
    assert(TextOps.repetitionStats(docs).count() == docs.count())
  }

  test("q45 heavy hitters: sketch estimates upper-bound exact counts, stable under repartitioning") {
    val out = TextOps.heavyHitters(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 20)
    // the CMS can only overestimate, and on this corpus (vocab << width)
    // collisions are rare — estimates should sit close to exact
    out.foreach { case (tok, (tf, est)) =>
      assert(est >= tf, s"$tok: est $est < exact $tf")
      assert(est <= tf * 2, s"$tok: est $est implausibly far above $tf")
    }
    // deterministic under repartitioning (partials merge counter-wise)
    assertSameRows(TextOps.heavyHitters(docs),
      TextOps.heavyHitters(docs.repartition(13)))
  }

  test("q40 keywords rank dominant-rare tokens first, deterministically") {
    import spark.implicits._
    val d = Seq(
      (1L, "rareword rareword rareword common common stuff"),
      (2L, "common common common other other things"))
      .toDF("doc_id", "text")
    val out = TextOps.keywords(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1: rareword has tf 3 (max) and df 1 (only doc 1) — rank 1
    assert(out((1L, 1L)) == "rareword")
    // doc 2: common tf 3 — rank 1 despite df 2
    assert(out((2L, 1L)) == "common")
    // at most k rows per doc, ranks contiguous from 1
    val full = TextOps.keywords(docs)
    val perDoc = full.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("c"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
    assert(perDoc.filter(col("c") > 3 || col("mx") =!= col("c") || col("mn") =!= 1).count() == 0)
    // deterministic under repartitioning
    assertSameRows(full, TextOps.keywords(docs.repartition(13)))
  }

  test("q47 packing partitions every doc's tokens into exact contiguous chunk spans") {
    val cap = 128
    val out = TextOps.packSequences(docs, capacity = cap, shards = 4)
    out.persist()
    try {
      // per doc: the spans cover [0, n_tok) exactly — total tokens match
      val perDoc = out.groupBy(col("doc_id"))
        .agg(sum(col("n_toks")).as("tot"), min(col("tok_start")).as("mn"))
      val withN = perDoc.join(docs.select(col("doc_id"),
        TextOps.wsTokens(col("text")).as("n_tok")), "doc_id")
      assert(withN.filter(col("tot") =!= col("n_tok") || col("mn") =!= 0).count() == 0)
      // per (shard, chunk): exactly `cap` tokens except each shard's last chunk
      val perChunk = out.groupBy(col("shard"), col("chunk"))
        .agg(sum(col("n_toks")).as("tot"))
      val lastChunk = out.groupBy(col("shard")).agg(max(col("chunk")).as("last"))
      val bad = perChunk.join(lastChunk, "shard")
        .filter((col("chunk") =!= col("last") && col("tot") =!= cap) ||
          col("tot") > cap)
      assert(bad.count() == 0)
      // chunk ids are contiguous from 0 within each shard
      val chunkSeq = perChunk.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), (max(col("chunk")) + 1).as("span"), min(col("chunk")).as("mn"))
      assert(chunkSeq.filter(col("n") =!= col("span") || col("mn") =!= 0).count() == 0)
      // non-vacuous: straddling docs exist (a doc in >1 chunk)
      assert(out.groupBy(col("doc_id")).count().filter(col("count") > 1).count() > 0)
      // deterministic under repartitioning
      assertSameRows(out, TextOps.packSequences(docs.repartition(13), capacity = cap, shards = 4))
    } finally out.unpersist()
  }

  test("q48 mixture solve: scarcest lang binds, admitted counts track the target") {
    val target = Map("en" -> 2000, "es" -> 2000, "de" -> 2000, "fr" -> 2000, "zh" -> 2000)
    val out = TextOps.mixtureSolve(docs, target)
    out.persist()
    try {
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tTotal = target.map { case (l, t) => counts(l) * 10000L / t }.min
      val admitted = out.groupBy(col("lang")).agg(count(lit(1)).as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      target.foreach { case (l, t) =>
        val goal = tTotal * t / 10000
        // hash admission: binomial noise around the goal (≤ ~4σ + floor slack)
        val tol = 4 * math.sqrt(goal.toDouble) + 2
        assert(math.abs(admitted.getOrElse(l, 0L) - goal) <= tol,
          s"$l: admitted ${admitted.getOrElse(l, 0L)} vs goal $goal ± $tol")
      }
      // the scarcest language keeps (essentially) everything: its rate
      // is within one floor step of 10000
      val scarcest = target.keys.minBy(counts)
      val rates = out.select(col("lang"), col("rate_myriad")).distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rates(scarcest) >= 10000 - (10000 / counts(scarcest) + 1))
      assert(rates.values.forall(_ <= 10000))
      // a target lang missing from the corpus makes the mixture infeasible
      assert(TextOps.mixtureSolve(docs,
        Map("en" -> 5000, "xx" -> 5000)).count() == 0)
    } finally out.unpersist()
  }

  test("q48b tokenized mixture: admitted TOKEN mass tracks the target") {
    val target = Map("en" -> 2000, "es" -> 2000, "de" -> 2000, "fr" -> 2000, "zh" -> 2000)
    val vocab = TextOps.tokenizerVocabSeq(docs, m = 64, maxN = 4)
    val out = TextOps.mixtureSolveTokenized(docs, target, vocab)
    out.persist()
    try {
      // corpus-side per-lang token totals from the same tokenizer
      val perDoc = TextOps.tokenStatsWith(docs, vocab)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .filter(col("n_tokens") > 0)
      val masses = perDoc.groupBy("lang")
        .agg(sum("n_tokens").as("c"), sum(col("n_tokens") * col("n_tokens")).as("c2"),
          max("n_tokens").as("wmax"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val tTotal = target.map { case (l, t) => masses(l)._1 * 10000L / t }.min
      val admitted = out.groupBy("lang").agg(sum("n_tokens").as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      target.foreach { case (l, t) =>
        val (c, c2, wmax) = masses(l)
        val rate = (tTotal * t / 10000) * 10000 / c
        val goal = rate * c / 10000.0
        // per-DOC hash admission of whole docs: mass noise is
        // sqrt(p(1-p)·Σw²) ≤ sqrt(Σw²), plus one doc of floor slack
        val tol = 4 * math.sqrt(c2.toDouble) + wmax
        assert(math.abs(admitted.getOrElse(l, 0L) - goal) <= tol,
          s"$l: admitted ${admitted.getOrElse(l, 0L)} vs goal $goal ± $tol")
      }
      // non-vacuity: token budgeting actually changes the rates vs
      // q48's doc budgeting (per-doc token mass differs by language)
      val docRates = TextOps.mixtureSolve(docs, target)
        .select("lang", "rate_myriad").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tokRates = out.select("lang", "rate_myriad").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(tokRates != docRates, s"token rates $tokRates == doc rates $docRates")
      // deterministic under repartitioning
      assertSameRows(out,
        TextOps.mixtureSolveTokenized(docs.repartition(13), target, vocab))
      // a target lang missing from the corpus makes the mixture infeasible
      assert(TextOps.mixtureSolveTokenized(docs,
        Map("en" -> 5000, "xx" -> 5000), vocab).count() == 0)
    } finally out.unpersist()
  }

  test("q90 source quota: admitted token mass tracks per-source targets, unlisted drop") {
    val target = Map("src0" -> 3000, "src1" -> 2500, "src2" -> 1500, "src3" -> 500)
    val vocab = TextOps.tokenizerVocabSeq(docs, m = 64, maxN = 4)
    val out = TextOps.sourceQuota(docs, target, vocab)
    out.persist()
    try {
      // unlisted sources never admit (the quota is the allowlist)
      assert(out.select("source").distinct().collect()
        .map(_.getString(0)).toSet.subsetOf(target.keySet))
      // per-source admitted token mass tracks the solved goal within
      // whole-doc hash-admission noise (the q48b tolerance)
      val perDoc = TextOps.tokenStatsWith(docs, vocab)
        .join(docs.select("doc_id", "source"), "doc_id")
        .filter(col("n_tokens") > 0)
      val masses = perDoc.groupBy("source")
        .agg(sum("n_tokens").as("c"), sum(col("n_tokens") * col("n_tokens")).as("c2"),
          max("n_tokens").as("wmax"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val tTotal = target.map { case (s, t) => masses(s)._1 * 10000L / t }.min
      val admitted = out.groupBy("source").agg(sum("n_tokens").as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      target.foreach { case (s, t) =>
        val (c, c2, wmax) = masses(s)
        val rate = (tTotal * t / 10000) * 10000 / c
        val goal = rate * c / 10000.0
        val tol = 4 * math.sqrt(c2.toDouble) + wmax
        assert(math.abs(admitted.getOrElse(s, 0L) - goal) <= tol,
          s"$s: admitted ${admitted.getOrElse(s, 0L)} vs goal $goal ± $tol")
      }
      // the solved rates are non-uniform (distinct targets ⇒ distinct
      // rates on a roughly-uniform corpus)
      val rs = out.select("source", "rate_myriad").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rs.values.toSet.size > 1, s"rates $rs")
      // the frozen-rate table the s47 stream consumes matches the
      // rates the batch op solved
      val frozen = TextOps.sourceQuotaRates(docs, target, vocab)
      rs.foreach { case (s, r) => assert(frozen(s) == r, s"$s: $r vs ${frozen(s)}") }
      // deterministic under repartitioning
      assertSameRows(out, TextOps.sourceQuota(docs.repartition(13), target, vocab))
      // a target source missing from the corpus makes the quota infeasible
      assert(TextOps.sourceQuota(docs,
        Map("src0" -> 5000, "nosuch" -> 5000), vocab).count() == 0)
    } finally out.unpersist()
  }

  test("q52 segment dedup: cross-doc boilerplate drops, within-doc repeats stay") {
    import spark.implicits._
    val boiler = "all rights reserved subscribe to our newsletter today"  // 8 words
    val rows = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $boiler"),
      (2L, s"one two three four five six seven eight $boiler"),
      // within-doc repeat, unique corpus-wide: kept (q39's signal, not boilerplate)
      (3L, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep"),
      (4L, "short tail"),
      (5L, null.asInstanceOf[String]),
      (6L, "   "))
    val out = TextOps.segmentDedup(rows.toDF("doc_id", "text"), segWords = 8)
    val m = out.collect().map(r => r.getLong(0) -> r).toMap
    // the shared 8-word boilerplate segment drops from BOTH docs
    assert(m(1L).getLong(1) == 2 && m(1L).getLong(2) == 1)
    assert(m(1L).getString(3) == "alpha beta gamma delta epsilon zeta eta theta")
    assert(m(2L).getString(3) == "one two three four five six seven eight")
    // doc 3: two identical segments, but only one distinct doc → kept
    assert(m(3L).getLong(2) == 0 && m(3L).getString(3).split(" ").length == 16)
    // partial last segment, unique → kept whole
    assert(m(4L).getLong(1) == 1 && m(4L).getString(3) == "short tail")
    // null text → null triple; blank → (0, 0, "")
    assert(m(5L).isNullAt(1) && m(5L).isNullAt(2) && m(5L).isNullAt(3))
    assert(m(6L).getLong(1) == 0 && m(6L).getLong(2) == 0 && m(6L).getString(3) == "")
    // corpus level: n_segments counts ceil(words/8); deterministic
    val corp = TextOps.segmentDedup(docs, segWords = 8)
    val check = corp.join(docs, "doc_id")
      .select(col("n_segments"),
        ceil(TextOps.wsTokens(col("text")) / 8.0).cast("long").as("want"))
    assert(check.filter(col("n_segments") =!= col("want")).count() == 0)
    // non-vacuous on the corpus: planted near-dups share segments
    assert(corp.agg(sum("n_dup_segments")).head().getLong(0) > 0)
    assertSameRows(corp, TextOps.segmentDedup(docs.repartition(13), segWords = 8))
  }

  test("q51 greedy tokenizer: maximal munch, fallback, whitespace, code points") {
    import spark.implicits._
    val vocab = Seq("aaa", "ab", "xy", "😀x") // 😀x = 2 code points
    def stats(rows: Seq[(Long, String)]): Map[Long, (Any, Any)] =
      TextOps.tokenStatsWith(rows.toDF("doc_id", "text"), vocab)
        .collect().map(r => r.getLong(0) -> (
          (if (r.isNullAt(1)) null else r.getLong(1)): Any,
          (if (r.isNullAt(2)) null else r.getLong(2)): Any)).toMap
    val m = stats(Seq(
      1L -> "aaab",  // greedy: "aaa" then fallback "b" — maximal munch,
                     // NOT the 2-match "aa"+"ab" a backtracking search finds
      2L -> "ab aaa",   // two clean matches across a word boundary
      3L -> "a b",      // no 2-gram spans whitespace: two fallbacks
      4L -> "😀x😀", // match 😀x, fallback 😀 — CODE
                                          // POINT consumption, not UTF-16
      5L -> "",         // empty: zero tokens, zero fallbacks
      6L -> " \t\n ",   // whitespace-only: same
      7L -> "AB AAA",   // lowercased before tokenization == doc 2
      8L -> "xyxyxy"))  // tiling: three matches
    assert(m(1L) == ((2L, 1L)), m(1L))
    assert(m(2L) == ((2L, 0L)))
    assert(m(3L) == ((2L, 2L)))
    assert(m(4L) == ((2L, 1L)))
    assert(m(5L) == ((0L, 0L)))
    assert(m(6L) == ((0L, 0L)))
    assert(m(7L) == ((2L, 0L)))
    assert(m(8L) == ((3L, 0L)))
    // null text stays null (the batch length()/ratio convention)
    val withNull = stats(Seq(1L -> "ab", 2L -> null.asInstanceOf[String]))
    assert(withNull(2L) == ((null, null)))
  }

  test("q51 vocab: frequency-ranked word-local grams with deterministic ties") {
    import spark.implicits._
    val tiny = Seq((1L, "abc abc abc zz zz"), (2L, "abc qq")).toDF("doc_id", "text")
    // grams: ab/bc/abc appear 4x (one per "abc"), zz 2x, qq 1x;
    // top-3 under (cnt DESC, gram ASC) is the tie broken binary order
    val v = TextOps.tokenizerVocab(tiny, m = 3, maxN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v == Seq(("ab", 4L), ("abc", 4L), ("bc", 4L)), v)
    // real corpus: no gram ever contains whitespace (word-local build —
    // the invariant the tokenizer's no-boundary-check relies on)
    val grams = TextOps.tokenizerVocab(docs, m = 500)
      .collect().map(_.getString(0))
    assert(grams.nonEmpty && grams.forall(g => !g.exists(_.isWhitespace)))
  }

  test("q51 expression evaluates ONCE per doc; q47b packs exactly the q51 totals") {
    val vocab = TextOps.tokenizerVocabSeq(docs, m = 64)
    val n = docs.count()
    val before = graft.functions.GreedyTokenStatsExpr.evals.get()
    val stats = TextOps.tokenStatsWith(docs, vocab)
    graft.functions.GreedyTokenStatsExpr.countEvals = true
    try stats.collect() // both struct fields consumed downstream
    finally graft.functions.GreedyTokenStatsExpr.countEvals = false
    val evals = graft.functions.GreedyTokenStatsExpr.evals.get() - before
    // CollapseProject must not inline the struct into two per-field
    // copies of the (expensive) scan — the q50 double-codec class
    assert(evals == n, s"expression evaluated $evals times for $n docs")
    // q47b packs every q51 token exactly once
    val packed = TextOps.packSequencesTokenized(docs, vocab, capacity = 128, shards = 4)
    val packedTotal = packed.agg(sum(col("n_toks"))).head().getLong(0)
    val statsTotal = stats.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(packedTotal == statsTotal)
    // and the corpus exercises BOTH match and fallback paths
    assert(stats.filter(col("n_fallback") > 0).count() > 0)
    assert(stats.filter(col("n_tokens") > col("n_fallback")).count() > 0)
  }

  test("q58 pii: detects and redacts planted classes; clean text is PII-free; nulls flow") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.io and c.d+x@sub.example.org here"),   // 2 emails
      (2L, "host 10.0.0.1 and 255.255.255.255 up"),         // 2 ips
      (3L, "call 555-123-4567 now"),                        // 1 phone
      (4L, "user9@10.1.2.3.example.com then 10.1.2.3 left"),// email w/ IP-ish domain counts ONCE
      (5L, "no pii at all"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getString(4) == "mail <EMAIL> and <EMAIL> here")
    assert(out(2L).getLong(2) == 2 && out(2L).getString(4) == "host <IP> and <IP> up")
    assert(out(3L).getLong(3) == 1 && out(3L).getString(4) == "call <PHONE> now")
    // the chain contract: the email (greedy, domain swallows the
    // IP-shaped tail) is redacted FIRST, so only the standalone IP
    // remains to be counted as an IP
    assert(out(4L).getLong(1) == 1 && out(4L).getLong(2) == 1)
    assert(out(4L).getString(4) == "<EMAIL> then <IP> left")
    assert(out(5L).getLong(1) == 0 && out(5L).getLong(2) == 0 && out(5L).getLong(3) == 0)
    assert(out(5L).getString(4) == "no pii at all")
    assert(out(6L).isNullAt(1) && out(6L).isNullAt(4))
    // idempotence: redacting clean text finds nothing (tokens are inert)
    val again = TextOps.piiRedact(
      TextOps.piiRedact(docs).select(col("doc_id"), col("clean_text").as("text")))
    assert(again.agg(sum(col("n_emails") + col("n_ips") + col("n_phones")))
      .head().getLong(0) == 0L)
  }

  test("q61 perplexity: hand-replayable micro corpus, repetition scores lower") {
    import spark.implicits._
    // corpus: "a b a b" (d1), "a b" (d2), "x" (d3, no bigrams), "" (d4)
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"), (4L, "  "))
      .toDF("doc_id", "text")
    val out = TextOps.perplexity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // model: V=3 (a,b,x); bigrams: (a,b)x3 (b,a)x1; c1: a=3, b=1
    // nll(a,b) = L(3+3) - L(3+1); nll(b,a) = L(1+3) - L(1+1)
    val L = graft.functions.Log2Q16Expr.compute _
    val nab = L(6L) - L(4L)
    val nba = L(4L) - L(2L)
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2 * nab + nba)
    assert(out(1L).getLong(3) == (2 * nab + nba) / 3)
    assert(out(2L).getLong(1) == 1 && out(2L).getLong(2) == nab)
    // d3/d4: no bigrams -> zero counts, null ppl
    for (id <- Seq(3L, 4L)) {
      assert(out(id).getLong(1) == 0 && out(id).getLong(2) == 0)
      assert(out(id).isNullAt(3))
    }
    // a heavily repeated doc is LESS perplexing than the real corpus:
    // score the sf corpus and check the planted repetition ranks low
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val rep = spark.range(1).select(lit(900001L).as("doc_id"),
      lit(("the cat sat " * 40).trim).as("text"))
    val scored = TextOps.perplexity(corpus.unionAll(rep))
      .filter(col("n_bigrams") > 0)
    val repPpl = scored.filter(col("doc_id") === 900001L)
      .head().getLong(3)
    val medianish = scored.agg(expr("percentile_approx(ppl_q16, 0.5)"))
      .head().getLong(0)
    assert(repPpl < medianish,
      s"repeated text ppl $repPpl should sit far below corpus median $medianish")
  }

  test("q62 bm25: positive scores, planted term-stuffed doc ranks first, repartition-stable") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val out = TextOps.bm25Search(docs)
    // non-negative, not strictly positive: Q16 truncation can collide
    // L(2N+2) with L(2df+1) for a near-ubiquitous term once N ≳ 47k,
    // making idf_q16 (and the score) exactly 0 — Spark and the oracle
    // still agree, so 0 is legal
    assert(out.filter(col("score_q16") < 0).count() == 0, "lucene idf keeps scores non-negative")
    assert(out.groupBy("token").count().filter(col("count") =!= 10).count() == 0)
    // ranks are 1..10, and (rank asc) follows (score desc, doc_id asc)
    val byTerm = out.collect().groupBy(_.getString(0))
    byTerm.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 10L),
        "ranks are dense 1..10")
      sorted.sliding(2).foreach { case Array(a, b) =>
        val better = a.getLong(3) > b.getLong(3) ||
          (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2))
        assert(better, s"ordering violated: $a vs $b")
      case _ => ()
      }
    }
    // a doc that is ONLY a frequent query term repeated has the
    // term's maximal tf/dl ratio -> it must take rank 1 for that term
    val term = out.filter(col("rank") === 1).orderBy(col("token")).head().getString(0)
    val planted = Seq((900002L, Seq.fill(200)(term).mkString(" "))).toDF("doc_id", "text")
    val out2 = TextOps.bm25Search(docs.unionAll(planted))
    assert(out2.filter(col("token") === term && col("rank") === 1)
      .head().getLong(2) == 900002L)
    // partitioning invariance
    val a = out.orderBy("token", "rank").collect().toSeq
    val b = TextOps.bm25Search(docs.repartition(7, col("doc_id")))
      .orderBy("token", "rank").collect().toSeq
    assert(a == b)
  }

  test("q61 perplexity is partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val a = TextOps.perplexity(docs).orderBy("doc_id").collect().toSeq
    val b = TextOps.perplexity(docs.repartition(7, col("doc_id")))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("q78 epoch shuffle: bijective global order, dense shard ranks, balanced, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = TextOps.epochShuffle(docs, shards = 8).localCheckpoint(true)
    assert(out.count() == n, "permutation covers every doc")
    // global_pos is a bijection onto 0..N-1
    val gp = out.agg(countDistinct(col("global_pos")),
      min(col("global_pos")), max(col("global_pos"))).head()
    assert(gp.getLong(0) == n && gp.getLong(1) == 0L && gp.getLong(2) == n - 1)
    // within-shard positions are dense 0..|shard|-1, and global_pos
    // lays shards out contiguously in shard order
    val perShard = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"),
        min(col("global_pos")).as("gmin"), max(col("global_pos")).as("gmax"))
      .orderBy(col("shard")).collect()
    perShard.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - 1, s"non-dense pos in shard ${r.getLong(0)}")
      assert(r.getLong(4) - r.getLong(3) + 1 == r.getLong(1), "shard block not contiguous")
    }
    perShard.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(3) == a.getLong(4) + 1, "shard blocks out of order")
      case _ => ()
    }
    // the avalanche post-mix balances shards (hash, not residue-class,
    // routing): every shard within 2x of the uniform share
    val share = n.toDouble / 8
    perShard.foreach(r => assert(r.getLong(1) > share / 2 && r.getLong(1) < share * 2,
      s"skewed shard: ${r.getLong(1)} vs uniform $share"))
    // the order actually shuffles: the doc_id sequence read in epoch
    // order is far from sorted (few adjacent-id pairs stay adjacent)
    val order = out.orderBy(col("global_pos")).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val adjacentKept = order.sliding(2).count {
      case Array(x, y) => y == x + 1
      case _ => false
    }
    assert(adjacentKept < n / 20, s"order too close to identity: $adjacentKept adjacent pairs")
    // pure function of doc_id: repartitioning changes nothing
    val a = out.orderBy("doc_id").collect().toSeq
    val b = TextOps.epochShuffle(docs.repartition(7, col("doc_id")), shards = 8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // -- q96 UniMax waterfilling -------------------------------------------

  test("q96 unimax: budget exhausted exactly, caps respected, waterfill level uniform") {
    val out = TextOps.unimaxAlloc(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val totalTok = out.map(_._2).sum
    val budget = totalTok * 3 / 2
    assert(out.map(_._4).sum == budget, "allocations must sum to the budget exactly")
    out.foreach { case (s, _, cap, alloc) =>
      assert(alloc <= cap, s"source $s allocated over its epoch cap") }
    // uncapped sources all sit within 1 token of one water level
    val uncapped = out.filter { case (_, _, cap, alloc) => alloc < cap }.map(_._4)
    assert(uncapped.nonEmpty, "registered sizing must leave some sources uncapped")
    assert(uncapped.max - uncapped.min <= 1,
      s"waterfill level not uniform: ${uncapped.min}..${uncapped.max}")
    // every capped source is SMALLER than every uncapped one (prefix rule)
    val cappedCaps = out.filter { case (_, _, cap, alloc) => alloc == cap }.map(_._3)
    if (cappedCaps.nonEmpty)
      assert(cappedCaps.max <= uncapped.min + 1,
        "a capped source cannot exceed the water level")
  }

  test("q96 unimax: hand-checkable tiny corpus and the infeasible-budget degenerate") {
    import spark.implicits._
    // sources with 2 / 4 / 20 tokens; E=3, B = (26*3) DIV 2 = 39
    // capacities 6 / 12 / 60; waterfill: s0 capped (6 <= 39 DIV 3 = 13),
    // s1 capped (12 <= 33 DIV 2 = 16), s2 gets 39-18 = 21
    val tiny = Seq(
      (1L, "a b", "s0"), (2L, "a b c d", "s1"),
      (3L, (1 to 20).map(_ => "w").mkString(" "), "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.unimaxAlloc(tiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("s0") == ((6L, 6L, 30000L)))  // 3 full epochs
    assert(out("s1") == ((12L, 12L, 30000L)))
    assert(out("s2") == ((60L, 21L, 10500L))) // 1.05 epochs
    // infeasible budget (B >= sum capacities): everyone capped
    val all = TextOps.unimaxAlloc(tiny, epochCap = 1, budgetNum = 10L, budgetDen = 1L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(all.forall { case (cap, alloc) => alloc == cap })
  }
}
