package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q71 ExactSubstr duplicated-span removal: value gate is the DuckDB
  * replay (window digests, keep-first, span-union cut); these pin the
  * CONTRACTS — hand-replayed cut geometry (cross-doc, within-doc,
  * overlapping-window union, full-doc cut), conservation, the
  * keep-first rule, and corpus-level bite.
  */
class ExactSubstrSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.ExactSubstr

  private def micro = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h"),                    // donor: 8 tokens
      (2L, "x x c d e f g h y"),                  // shares the 6-gram c..h at pos 3
      (3L, "a b c d e f g h"),                    // exact copy of doc 1 -> fully cut
      (4L, "p q r s t"),                          // 5 tokens < k -> untouched
      (5L, "   "),                                // blank -> 0 tokens
      (6L, "m n o p q r m n o p q r"),            // within-doc repeat at pos 7
      (7L, "zz a b c d e f g h")                  // two overlapping marked windows -> union
    ).toDF("doc_id", "text")
  }

  test("hand-replayed cut geometry: cross-doc, within-doc, overlap union, full cut") {
    val out = ExactSubstr.substringDedup(micro).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((8L, 0L, "a b c d e f g h")), s"donor must be untouched: ${out(1L)}")
    // doc 2: window (2,3)=c d e f g h duplicates (1,3) -> cut 3..8
    assert(out(2L) == ((9L, 6L, "x x y")))
    // doc 3: windows at 1,2,3 all duplicate doc 1 -> union covers 1..8
    assert(out(3L) == ((8L, 8L, "")))
    assert(out(4L) == ((5L, 0L, "p q r s t")))
    assert(out(5L) == ((0L, 0L, "")))
    // doc 6: "m n o p q r" at pos 7 duplicates pos 1 OF THE SAME DOC
    assert(out(6L) == ((12L, 6L, "m n o p q r")))
    // doc 7: windows (7,2)="a..f" and (7,3)="b..g" and (7,4)="c..h" all
    // duplicate doc 1 -> union covers 2..9, only "zz" survives
    assert(out(7L) == ((9L, 8L, "zz")))
  }

  test("conservation and first-occurrence survival on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = ExactSubstr.substringDedup(docs).localCheckpoint(true)
    assert(out.count() == docs.count())
    // clean token count == n_tokens - n_removed, removal never negative
    val bad = out.filter(
      size(filter(split(col("clean_text"), "\\s+"), t => length(t) > 0))
        =!= col("n_tokens") - col("n_removed")).count()
    assert(bad == 0)
    assert(out.filter(col("n_removed") < 0).count() == 0)
    // the operator must BITE on this corpus (24 planted dup docs at sf0.001)
    val hit = out.filter(col("n_removed") > 0).count()
    info(s"docs with removed spans: $hit")
    assert(hit >= 10, s"expected the planted duplicate family to be cut, got $hit")
    // untouched docs round-trip to their normalized token stream
    val toksOf = (c: org.apache.spark.sql.Column) =>
      concat_ws(" ", filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0))
    val joined = out.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    assert(joined.filter(col("n_removed") === 0)
      .filter(col("clean_text") =!= toksOf(col("text"))).count() == 0)
  }

  test("deterministic under repartitioning") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = ExactSubstr.substringDedup(docs)
    val b = ExactSubstr.substringDedup(docs.repartition(7))
    assertSameRows(a, b)
  }

  test("dup-window table: firsts only, cap fails loudly") {
    val t = ExactSubstr.dupWindowTable(micro)
    // doc 1's three windows are the firsts of every duplicated digest
    // (doc 6's pos-1 window and doc 2/3/7's spans all resolve to them
    // or to doc 6's own first)
    assert(t.nonEmpty)
    assert(t.values.forall { case (d, p) => (d == 1L || d == 6L) && p >= 1 })
    val e = intercept[IllegalArgumentException] {
      ExactSubstr.dupWindowTable(micro, maxDupWindows = 1)
    }
    assert(e.getMessage.contains("stream-static"))
  }
}
