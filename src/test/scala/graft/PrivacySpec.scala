package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q97 k-anonymity / q98 DP counts — the release-gate contracts. */
class PrivacySpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Privacy

  private lazy val cust = graft.sources.Tables.customer(spark, sfDir)

  test("q97: every surviving QI combination is shared by >= k rows; suppression is all-or-nothing") {
    val out = Privacy.kAnonymize(cust, k = 5).localCheckpoint(true)
    assert(out.count() == cust.count())
    // k-anonymity property ON THE RELEASE: group by released QI values
    val released = out.filter(!col("suppressed"))
      .groupBy("nationkey_k", "segment_k", "bal_bucket_k")
      .agg(count(lit(1)).as("n"))
    assert(released.filter(col("n") < 5).count() == 0)
    // suppressed rows leak NO QI field
    assert(out.filter(col("suppressed") &&
      (col("nationkey_k").isNotNull || col("segment_k").isNotNull ||
        col("bal_bucket_k").isNotNull)).count() == 0)
    // non-suppressed rows keep ALL QI fields
    assert(out.filter(!col("suppressed") &&
      (col("nationkey_k").isNull || col("segment_k").isNull ||
        col("bal_bucket_k").isNull)).count() == 0)
  }

  test("q97: a planted singleton QI is suppressed; suppression grows with k") {
    import spark.implicits._
    val planted = cust.unionByName(
      Seq((999999L, "Mx Unique", 99, 987654.0, "UNICORN"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    val out = Privacy.kAnonymize(planted, k = 5)
    val row = out.filter(col("c_custkey") === 999999L).head()
    assert(row.getAs[Boolean]("suppressed") && row.getAs[Long]("group_size") == 1L)
    val s2 = Privacy.kAnonymize(cust, k = 2).filter(col("suppressed"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val s5 = Privacy.kAnonymize(cust, k = 5).filter(col("suppressed"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(s2.subsetOf(s5), "raising k can only suppress more")
  }

  test("q98: noise bounded by the truncated geometric, zero-mass and magnitude near discrete-Laplace") {
    import spark.implicits._
    // 300 groups x 50 docs: big enough that clipping never triggers,
    // many enough that the seeded draws expose the distribution
    val docs = (0 until 15000).map { i =>
      (i.toLong, "text", s"lang${i % 300 / 20}", s"s${i % 300}")
    }.toDF("doc_id", "text", "lang", "source")
    val out = Privacy.dpCounts(docs)
      .select(col("n_noised")).as[Long].collect()
    assert(out.length == 300)
    val noise = out.map(_ - 50L)
    assert(noise.forall(z => math.abs(z) <= 30), "|z| <= 2 x 15 by construction")
    val meanAbs = noise.map(math.abs).sum.toDouble / noise.length
    assert(meanAbs >= 0.9 && meanAbs <= 1.8,
      s"E|z| should be near 4/3 for alpha=1/2: got $meanAbs")
    val zeroFrac = noise.count(_ == 0).toDouble / noise.length
    assert(zeroFrac >= 0.22 && zeroFrac <= 0.45,
      s"P(z=0) should be near 1/3: got $zeroFrac")
    // clipping: a group of 1 doc can never release a negative count
    val tiny = Seq((1L, "t", "xx", "solo")).toDF("doc_id", "text", "lang", "source")
    assert(Privacy.dpCounts(tiny).select(col("n_noised")).as[Long].head() >= 0L)
  }

  test("q98 seed contract: two seeds disagree on releases while both pass the distribution gates") {
    // the r12 secrecy fix: eps holds only under seed secrecy, so the seed
    // is a parameter — different seeds must produce genuinely different
    // noise draws (else the 'secret' adds nothing) from the SAME family
    import spark.implicits._
    val docs = (0 until 15000).map { i =>
      (i.toLong, "text", s"lang${i % 300 / 20}", s"s${i % 300}")
    }.toDF("doc_id", "text", "lang", "source")
    def release(seed: Long): Map[String, Long] =
      Privacy.dpCounts(docs, seed).select(col("source"), col("n_noised"))
        .as[(String, Long)].collect().toMap
    val r0 = release(0L)
    val r7 = release(7L)
    assert(r0.keySet == r7.keySet)
    val nDiff = r0.count { case (k, v) => r7(k) != v }
    assert(nDiff >= 100, s"independent seeds should disagree on most groups: $nDiff/300")
    for (r <- Seq(r0, r7)) {
      val noise = r.values.map(_ - 50L)
      val meanAbs = noise.map(math.abs).sum.toDouble / noise.size
      assert(meanAbs >= 0.9 && meanAbs <= 1.8, s"E|z| gate per seed: $meanAbs")
    }
    // the registered/oracle path is exactly seed 0 (the PINNED simulation
    // seed — the scaladoc's secrecy contract)
    assert(Privacy.dpCounts(docs).select(col("source"), col("n_noised"))
      .as[(String, Long)].collect().toMap == r0)
  }
}
