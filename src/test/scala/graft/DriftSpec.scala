package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q100 PSI drift — the contracts the DuckDB hash-compare can't see:
  * sign structure, the zero of identical snapshots, planted-shift
  * sensitivity, and the union-grid coverage of vanished/new buckets.
  */
class DriftSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Drift
  import graft.sources.Tables

  private def mk(rows: Seq[(Long, String, String, java.lang.Long)]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, l, s, n) =>
        org.apache.spark.sql.Row(id, l, s, n) }),
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("lang", StringType, true),
        StructField("source", StringType, true),
        StructField("n_chars", LongType, true))))
  }

  test("registered instance: contributions are non-negative, shares positive, three features present") {
    val docs = Tables.documents(spark, sfDir)
    val out = Drift.driftPsi(docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 2 =!= 0)).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSet == Set("lang", "source", "len"))
    out.foreach { r =>
      assert(r.getLong(6) >= 0L, s"negative PSI contribution: $r")
      assert(r.getLong(4) > 0L && r.getLong(5) > 0L, s"non-positive share: $r")
    }
  }

  test("identical snapshots: every contribution is exactly zero") {
    val docs = Tables.documents(spark, sfDir)
    val out = Drift.driftPsi(docs, docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"count mismatch on identity: $r")
      assert(r.getLong(4) == r.getLong(5) && r.getLong(6) == 0L,
        s"identity snapshots must have zero drift: $r")
    }
  }

  test("a planted language shift dominates the stable features' PSI") {
    val base = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", s"src${i % 4}", java.lang.Long.valueOf(100 + (i % 7))))
    // candidate: language mix flips to 90% en; source/len marginals kept
    val cand = (0L until 200L).map(i =>
      (i, if (i % 10 == 0) "de" else "en", s"src${i % 4}", java.lang.Long.valueOf(100 + (i % 7))))
    val out = Drift.driftPsi(mk(base), mk(cand)).collect()
    val psi = out.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(6)).sum }
    assert(psi("lang") > 10L * math.max(psi("source"), 1L),
      s"shifted feature must dominate: $psi")
    assert(psi("lang") > 10L * math.max(psi("len"), 1L), psi.toString)
  }

  test("union grid: vanished buckets (baseline-only) and new buckets (candidate-only) both report") {
    val old = mk(Seq((1L, "en", "gone_src", java.lang.Long.valueOf(10L)),
      (2L, "en", "stable", java.lang.Long.valueOf(10L))))
    val neu = mk(Seq((3L, "en", "new_src", java.lang.Long.valueOf(10L)),
      (4L, "en", "stable", java.lang.Long.valueOf(10L))))
    val src = Drift.driftPsi(old, neu).collect()
      .filter(_.getString(0) == "source")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(src("gone_src") == ((1L, 0L)), "vanished bucket must report n2=0")
    assert(src("new_src") == ((0L, 1L)), "new bucket must report n1=0")
    assert(src("stable") == ((1L, 1L)))
  }

  test("null metadata routes to the <null> bucket in all three features") {
    val old = mk(Seq((1L, null, null, null)))
    val neu = mk(Seq((2L, "en", "s", java.lang.Long.valueOf(5L))))
    val out = Drift.driftPsi(old, neu).collect()
    val nulls = out.filter(_.getString(1) == "<null>").map(_.getString(0)).toSet
    assert(nulls == Set("lang", "source", "len"))
  }

  test("empty snapshots degrade safely: empty-vs-X reports X's buckets, empty-vs-empty is empty") {
    val docs = mk(Seq((1L, "en", "s", java.lang.Long.valueOf(5L))))
    val none = mk(Seq.empty)
    val a = Drift.driftPsi(none, docs).collect()
    assert(a.nonEmpty && a.forall(r => r.getLong(2) == 0L && r.getLong(6) >= 0L),
      "empty baseline: every bucket is candidate-only, contribs still defined")
    val b = Drift.driftPsi(docs, none).collect()
    assert(b.nonEmpty && b.forall(r => r.getLong(3) == 0L),
      "empty candidate: every bucket is baseline-only (the everything-vanished alarm)")
    assert(Drift.driftPsi(none, none).count() == 0L)
  }

  test("q100b alert: planted stable / minor / major shifts land in their bands") {
    // identical snapshots: PSI exactly 0 -> stable on every feature
    val base = (0L until 100L).map(i =>
      (i, if (i < 50) "en" else "de", "s", java.lang.Long.valueOf(10L)))
    val stable = Drift.driftAlert(mk(base), mk(base)).collect()
    assert(stable.nonEmpty && stable.forall(_.getString(3) == "stable"), stable.mkString(","))
    // minor: 50/50 -> 67/33 language mix; smoothed PSI_ln =
    // 0.1667·ln(0.6667/0.5) + 0.1667·ln(0.5/0.3333) ≈ 0.116 — inside
    // the (0.1, 0.2) band with ≥15% margin on both sides
    // (source/len identical -> stable)
    val minor = (0L until 100L).map(i =>
      (i, if (i < 67) "en" else "de", "s", java.lang.Long.valueOf(10L)))
    val mAlert = Drift.driftAlert(mk(base), mk(minor)).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(mAlert("lang") == "minor_shift", mAlert.toString)
    assert(mAlert("source") == "stable" && mAlert("len") == "stable")
    // major: the mix flips 90/10 -> 10/90; PSI_ln ≈ 3.4 >> 0.2
    val hot = (0L until 100L).map(i =>
      (i, if (i < 90) "en" else "de", "s", java.lang.Long.valueOf(10L)))
    val cold = (0L until 100L).map(i =>
      (i, if (i < 10) "en" else "de", "s", java.lang.Long.valueOf(10L)))
    val bAlert = Drift.driftAlert(mk(hot), mk(cold)).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(bAlert("lang") == "major_shift", bAlert.toString)
  }

  test("q100b alert: totals equal the report's per-feature sums; alertLevel agrees with the column path") {
    val docs = Tables.documents(spark, sfDir)
    val o = docs.filter(col("doc_id") % 3 =!= 0)
    val n = docs.filter(col("doc_id") % 2 =!= 0)
    val report = Drift.driftPsi(o, n).collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> ((rs.length.toLong, rs.map(_.getLong(6)).sum)) }
    val alert = Drift.driftAlert(o, n).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(alert.keySet == report.keySet)
    report.foreach { case (f, (nb, psi)) =>
      assert(alert(f)._1 == nb && alert(f)._2 == psi, s"$f: ${alert(f)} vs ($nb, $psi)")
      assert(alert(f)._3 == Drift.alertLevel(psi),
        "the JVM rule and the column path must share the pinned constants")
    }
    // the constants themselves (pinned literals, MAJOR = 2·MINOR)
    assert(Drift.PsiMajorE8Q16 == 2L * Drift.PsiMinorE8Q16)
    assert(Drift.alertLevel(Drift.PsiMinorE8Q16 - 1) == "stable")
    assert(Drift.alertLevel(Drift.PsiMinorE8Q16) == "minor_shift")
    assert(Drift.alertLevel(Drift.PsiMajorE8Q16) == "major_shift")
  }

  test("len bucketing: the column path and the s55 JVM twin agree on the cap and the grid") {
    assert(Drift.lenBucket(Some(0L), 256L, 15L) == "0")
    assert(Drift.lenBucket(Some(255L), 256L, 15L) == "0")
    assert(Drift.lenBucket(Some(256L), 256L, 15L) == "1")
    assert(Drift.lenBucket(Some(1000000L), 256L, 15L) == "15")
    assert(Drift.lenBucket(None, 256L, 15L) == "<null>")
    // cross-check vs the Column path on a one-doc frame
    val one = mk(Seq((1L, "en", "s", java.lang.Long.valueOf(700L))))
    val bucket = Drift.driftPsi(one, one).collect()
      .filter(_.getString(0) == "len").map(_.getString(1)).head
    assert(bucket == Drift.lenBucket(Some(700L), 256L, 15L))
  }
}
