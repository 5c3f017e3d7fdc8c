package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.BottomKByHashBuffer

/** q46 quantile sketch: kernel properties (model equivalence, merge,
  * serde) plus the operator-level guarantees — partition invariance,
  * exactness at N ≤ k, and the O(1/√k) rank-error bound that makes a
  * k-sample a usable gating threshold.
  */
class QuantileSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.TextOps
  import graft.sources.Tables

  private def modelBottomK(xs: Seq[(Long, Double)], k: Int): Seq[Double] =
    xs.sortBy { case (h, v) => (h, v) }.take(k).map(_._2).sorted

  test("BottomKByHashBuffer equals sort-based bottom-k for arbitrary inputs") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(12)
      // dense hash range forces (h, v) ties at the boundary
      val xs = Seq.fill(rnd.nextInt(80))(
        (rnd.nextInt(15).toLong, (rnd.nextInt(10) - 5).toDouble))
      val buf = new BottomKByHashBuffer(k)
      xs.foreach { case (h, v) => buf.insert(h, v) }
      assert(buf.sortedValues.toSeq == modelBottomK(xs, k), s"k=$k xs=$xs")
    }
  }

  test("BottomKByHashBuffer merge equals bottom-k of the concatenation, incl. serde") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val rnd = new Random(7)
    val agg = graft.functions.QuantileSketchAgg(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), 8)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      def mk() = Seq.fill(rnd.nextInt(50))(
        (rnd.nextInt(12).toLong, (rnd.nextInt(8) - 4).toDouble))
      val (a, b) = (mk(), mk())
      def fill(xs: Seq[(Long, Double)]) = {
        val buf = new BottomKByHashBuffer(k)
        xs.foreach { case (h, v) => buf.insert(h, v) }
        buf
      }
      // serde round-trip on the right side — the path a shuffle takes
      val ba = fill(a)
      val bb = agg.deserialize(agg.serialize(fill(b)))
      assert(bb.k == k)
      ba.mergeFrom(bb)
      assert(ba.sortedValues.toSeq == modelBottomK(a ++ b, k), s"k=$k a=$a b=$b")
    }
  }

  lazy val docs = Tables.documents(spark, sfDir)

  test("q46 sample is invariant under partitioning (mergeability, end to end)") {
    val one = TextOps.quantileGate(docs.repartition(1), k = 64).collect().toSet
    val many = TextOps.quantileGate(docs.repartition(17), k = 64).collect().toSet
    assert(one == many)
    assert(one.nonEmpty)
  }

  test("q46 cutoffs are EXACT order statistics when N <= k") {
    import spark.implicits._
    val n = 200
    val rnd = new Random(3)
    val small = (0 until n)
      .map(i => (i.toLong, "a" * (rnd.nextInt(97) + 1)))
      .toDF("doc_id", "text")
    val out = TextOps.quantileGate(small, k = 1024)
      .filter(col("metric") === "n_chars").collect()
    val sorted = small.select(length(col("text")).cast("double"))
      .collect().map(_.getDouble(0)).sorted
    for (r <- out) {
      val pct = r.getLong(1); val cutoff = r.getDouble(2)
      assert(r.getLong(3) == n) // sample IS the data
      assert(cutoff == sorted(((pct * (n - 1)) / 100).toInt), s"pct=$pct")
    }
  }

  test("q46 rank error stays within 3/sqrt(k) of the true quantile") {
    import spark.implicits._
    // 20k docs, lengths 1..400 — true quantiles known analytically
    val n = 20000
    val big = (0 until n).map(i => (i.toLong, "a" * (i % 400 + 1)))
      .toDF("doc_id", "text").repartition(13)
    val k = 1024
    val out = TextOps.quantileGate(big, k = k)
      .filter(col("metric") === "n_chars").collect()
    val bound = 3.0 / math.sqrt(k) // ~0.094: 3 sigma of a k-sample's rank
    for (r <- out) {
      val pct = r.getLong(1); val cutoff = r.getDouble(2)
      assert(r.getLong(3) == k)
      // true rank of the cutoff in the uniform 1..400 length mix
      val trueRank = (cutoff - 0.5) / 400.0 // each length ~ n/400 docs
      assert(math.abs(trueRank - pct / 100.0) <= bound,
        s"pct=$pct cutoff=$cutoff trueRank=$trueRank")
    }
  }

  test("q46 output shape: 2 metrics x 9 percentiles, no nulls") {
    val out = TextOps.quantileGate(docs, k = 256).collect()
    assert(out.length == 18)
    assert(out.forall(r => !r.anyNull))
    assert(out.map(_.getString(0)).toSet == Set("n_chars", "alpha_ratio"))
    // cutoffs are monotone in pct per metric
    for (m <- Seq("n_chars", "alpha_ratio")) {
      val cuts = out.filter(_.getString(0) == m).sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(cuts.zip(cuts.tail).forall { case (a, b) => a <= b }, cuts.toSeq)
    }
  }
}
