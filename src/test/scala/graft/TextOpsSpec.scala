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
}
