package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q69 DSIR importance resampling: value gate is the DuckDB replay
  * (buckets, both bag models, the Q16 log-ratio, the keep rank);
  * these pin the selection CONTRACTS — exact keep cardinality and
  * order, the enrichment property the operator exists for, and the
  * degenerate shapes.
  */
class DsirSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dsir
  import graft.sources.Tables

  lazy val docs = Tables.documents(spark, sfDir)

  test("keep is exactly the top-M by (importance DESC, doc_id ASC)") {
    val out = Dsir.dsirSelect(docs).localCheckpoint(true)
    assert(out.count() == docs.count())
    val m = out.filter(col("keep") === 1L).count()
    assert(m == math.min(100L, docs.count()))
    // no dropped doc may outrank a kept one
    val worstKept = out.filter(col("keep") === 1L)
      .orderBy(col("imp_q16").asc, col("doc_id").desc)
      .select(col("imp_q16"), col("doc_id")).collect()(0)
    val bestDropped = out.filter(col("keep") === 0L)
      .orderBy(col("imp_q16").desc, col("doc_id").asc)
      .select(col("imp_q16"), col("doc_id")).collect()(0)
    val better = bestDropped.getLong(0) > worstKept.getLong(0) ||
      (bestDropped.getLong(0) == worstKept.getLong(0) &&
        bestDropped.getLong(1) < worstKept.getLong(1))
    assert(!better, s"dropped $bestDropped outranks kept $worstKept")
  }

  test("selection is enriched in the target domain — the property DSIR exists for") {
    val out = Dsir.dsirSelect(docs, targetLang = "en")
    val joined = out.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .localCheckpoint(true)
    val baseRate = joined.filter(col("lang") === "en").count().toDouble / joined.count()
    val kept = joined.filter(col("keep") === 1L)
    val keptRate = kept.filter(col("lang") === "en").count().toDouble / kept.count()
    info(f"en base rate $baseRate%.3f -> kept rate $keptRate%.3f")
    assert(keptRate > 2 * baseRate,
      f"no enrichment: base $baseRate%.3f kept $keptRate%.3f")
  }

  test("deterministic under repartitioning; degenerate corpora degrade") {
    val a = Dsir.dsirSelect(docs).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = Dsir.dsirSelect(docs.repartition(7)).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq == b.toSeq)
    // bigram-less docs carry imp 0 and still appear
    import spark.implicits._
    val tiny = Seq((1L, "hello", "en"), (2L, "x", "de"), (3L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Dsir.dsirSelect(tiny, keepTop = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 3)
    assert(out(1L) == ((0L, 0L, 1L)) && out(2L) == ((0L, 0L, 1L)) &&
      out(3L) == ((0L, 0L, 0L)), s"got $out") // all imp 0 -> keep by id order
  }
}
