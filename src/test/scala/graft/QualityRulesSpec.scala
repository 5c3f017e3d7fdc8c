package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q70 Gopher rule battery: value gate is the DuckDB replay; these
  * pin the drop semantics — conjunction, per-rule attribution on
  * planted documents for the rules the synthetic corpus cannot fire,
  * and degenerate shapes.
  */
class QualityRulesSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.QualityRules
  import graft.sources.Tables

  test("corpus: battery is non-degenerate and pass is the exact conjunction") {
    val out = QualityRules.gopherRules(Tables.documents(spark, sfDir))
      .localCheckpoint(true)
    val n = out.count()
    val p = out.filter(col("pass") === 1L).count()
    assert(p > 0 && p < n, s"degenerate battery: $p/$n pass")
    // at least two distinct rules fire on this corpus
    val firing = Seq("r_words", "r_wlen", "r_alpha", "r_symbol", "r_stop")
      .count(rn => out.filter(col(rn) === 0L).count() > 0)
    assert(firing >= 2, s"only $firing rules bite")
    // pass recomputes as the conjunction of the five flags
    assert(out.filter(col("pass") =!=
      (col("r_words") === 1L && col("r_wlen") === 1L && col("r_alpha") === 1L &&
        col("r_symbol") === 1L && col("r_stop") === 1L).cast("long")).count() == 0)
  }

  test("planted docs fire the symbol and alpha rules; blank text fails everything") {
    import spark.implicits._
    val words20 = (1 to 17).map(_ => "the").mkString(" ")
    val planted = Seq(
      (1L, s"$words20 ### ...### ..."),   // 20 words, 3 symbol tokens -> 1500 myriad breach
      (2L, s"$words20 a1b2 c3d4"),        // 2 non-alpha tokens -> alpha 9000... still >= 8000
      (3L, (1 to 20).map(_ => "x9").mkString(" ")), // all non-alpha -> r_alpha 0
      (4L, "")).toDF("doc_id", "text")
    val out = QualityRules.gopherRules(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("r_symbol") == 0L, "symbol rule must fire")
    assert(out(2L).getAs[Long]("r_alpha") == 1L, "9000 myriad still passes alpha")
    assert(out(3L).getAs[Long]("r_alpha") == 0L, "all-non-alpha doc fails alpha")
    assert(out(4L).getAs[Long]("n_words") == 0L &&
      out(4L).getAs[Long]("pass") == 0L, "blank text fails")
  }

  test("gopherPassJvm (the s21 streaming twin) agrees with the Column battery row-for-row") {
    import spark.implicits._
    val words20 = (1 to 20).map(_ => "the").mkString(" ")
    val texts = Seq(
      null.asInstanceOf[String], "", "   ", "two words",
      words20,                                    // wlen 300 boundary (3-char words)
      (1 to 20).map(_ => "tempo").mkString(" "),  // 5-char: wlen 500 passes, no stopword
      (1 to 20).map(_ => "theory").mkString(" "), // 6-char: wlen 600 fails
      s"$words20 ### ... ###",                    // symbol breach
      (1 to 25).map(i => s"x$i").mkString(" "),   // digit words: alpha 0
      s"  $words20  extra   spacing\tacross\nlines the and of ")
    val planted = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val byId = QualityRules.gopherRules(planted).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("pass") == 1L)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(QualityRules.gopherPassJvm(t) == byId(i.toLong),
        s"JVM/Column battery disagree on doc $i: ${Option(t).map(_.take(40))}")
    }
    // both paths exercised
    assert(byId.values.exists(identity) && byId.values.exists(!_))
  }

  test("q77 c4Clean: hand-replayed line geometry — keep/drop per rule, sentence gate, page rules") {
    import spark.implicits._
    val keepDot = "one two three four five."
    val keepBang = "another full line here ok!"
    val keepQuote = "he said the word was \"fine\""
    val dropShort = "too short."
    val dropNoPunct = "five words but no punct x"
    val docs = Seq(
      // 3 kept lines (. ! ") -> n_sent 3 (the quote line contributes 0
      // marks via replace-count... the dot inside keepDot + bang) —
      // wait: n_sent counts .!? occurrences in KEPT text
      (1L, Seq(keepDot, dropShort, keepBang, dropNoPunct, keepQuote, "x. y? z!").mkString("\n")),
      (2L, Seq(keepDot, keepBang).mkString("\n")),             // 2 sent -> r_sent fails
      (3L, Seq("lorem ipsum here", keepDot, keepBang, keepQuote, "and a third one lands here.").mkString("\n")),
      (4L, Seq(keepDot, keepBang, "and a third one lands here.", "code { brace }").mkString("\n")),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = QualityRules.c4Clean(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: the 6th line "x. y? z!" is 3 words -> dropped by word
    // count even though it ends terminal; kept = dot, bang, quote
    assert(out(1L).getAs[String]("clean_text") ==
      Seq(keepDot, keepBang, keepQuote).mkString("\n"))
    assert(out(1L).getAs[Long]("n_lines") == 6L)
    assert(out(1L).getAs[Long]("n_kept") == 3L)
    // kept text carries '.' (keepDot) + '!' (keepBang) + 0 from the
    // quote line = 2 marks -> r_sent FAILS at the 3-sentence gate
    assert(out(1L).getAs[Long]("n_sent") == 2L)
    assert(out(1L).getAs[Long]("r_sent") == 0L && out(1L).getAs[Long]("pass") == 0L)
    // doc 2: both lines kept, 2 sentences -> sentence gate fails
    assert(out(2L).getAs[Long]("n_kept") == 2L && out(2L).getAs[Long]("r_sent") == 0L)
    // doc 3: lorem page rule fires regardless of clean content
    assert(out(3L).getAs[Long]("n_sent") >= 3L && out(3L).getAs[Long]("r_sent") == 1L)
    assert(out(3L).getAs[Long]("r_lorem") == 0L && out(3L).getAs[Long]("pass") == 0L)
    // doc 4: brace page rule; the brace line itself was dropped from
    // clean (no terminal punct) but the PAGE is still rejected
    assert(!out(4L).getAs[String]("clean_text").contains("{"))
    assert(out(4L).getAs[Long]("r_brace") == 0L && out(4L).getAs[Long]("pass") == 0L)
    // doc 5: null text -> null clean, zeroed counters, fails
    assert(out(5L).isNullAt(out(5L).fieldIndex("clean_text")))
    assert(out(5L).getAs[Long]("n_lines") == 0L && out(5L).getAs[Long]("pass") == 0L)
  }

  test("q77 planted corpus: every rule fires non-degenerately and pass is the conjunction") {
    val out = QualityRules.c4Clean(
      QualityRules.c4Plant(Tables.documents(spark, sfDir))).localCheckpoint(true)
    val n = out.count()
    val p = out.filter(col("pass") === 1L).count()
    assert(p > 0 && p < n, s"degenerate cleaner: $p/$n pass")
    // the planting fires each page rule on its residue class
    assert(out.filter(col("r_lorem") === 0L).count() > 0, "lorem rule never fires")
    assert(out.filter(col("r_brace") === 0L).count() > 0, "brace rule never fires")
    assert(out.filter(col("r_sent") === 0L).count() > 0, "sentence gate never fires")
    // line rules actually EDIT: kept strictly below raw lines somewhere,
    // nonzero keeps somewhere
    assert(out.filter(col("n_kept") < col("n_lines")).count() > 0)
    assert(out.filter(col("n_kept") > 0L).count() > 0)
    assert(out.filter(col("pass") =!=
      (col("r_lorem") === 1L && col("r_brace") === 1L &&
        col("r_sent") === 1L && col("r_lines") === 1L).cast("long")).count() == 0)
  }
}
