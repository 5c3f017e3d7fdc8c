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
}
