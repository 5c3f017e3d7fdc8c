package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q93 Z-order layout — interleave correctness and the MEASURED
  * pruning claim Layout.scala's scaladoc makes (buckets touched by a
  * min/max-stats pruner on the z layout vs the lexicographic one).
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Layout

  private lazy val li = graft.sources.Tables.lineitem(spark, sfDir)
  private lazy val encoded = Layout.zorderEncode(li).localCheckpoint(true)

  test("interleave16: known bit patterns and round-trip bijectivity on the grid") {
    import spark.implicits._
    val pts = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (1L, 1L), (0L, 0L), (0x1234L, 0x0F0FL))
    val out = pts.toDF("x", "y")
      .select(Layout.interleave16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(out(0) == 0x55555555L) // x fills even bits
    assert(out(1) == 0xAAAAAAAAL.toLong) // y fills odd bits
    assert(out(2) == 3L)
    assert(out(3) == 0L)
    // bijective: de-interleave recovers the inputs
    def deinter(z: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      (0 until 16).foreach { b =>
        x |= ((z >> (2 * b)) & 1L) << b
        y |= ((z >> (2 * b + 1)) & 1L) << b
      }
      (x, y)
    }
    pts.zip(out).foreach { case ((x, y), z) => assert(deinter(z) == (x, y)) }
  }

  test("q93 encode: zval within 32 bits, zbucket = top 6 bits, 64 buckets at sf0.001") {
    assert(encoded.filter(col("zval") < 0 || col("zval") > 0xFFFFFFFFL).count() == 0)
    assert(encoded.filter(col("zbucket") =!= shiftright(col("zval"), 26)).count() == 0)
    assert(encoded.select("zbucket").distinct().count() == 64)
    assert(encoded.count() == li.count())
  }

  test("pruning measured: suppkey-only band touches 16/64 z-buckets vs 64/64 lex; box 4 vs 13") {
    // sf0.001 domains: partkey 0..199, suppkey 0..9 (probed). The lex
    // comparison bucketizes the SAME scaled x coordinate into 64
    // slices — the layout a partkey-sorted write produces.
    val lexBucket = expr("CAST((l_partkey * 65535) DIV 199 AS BIGINT) DIV 1024")
    // suppkey-only predicate (sk in [4,5]): a partkey-sorted layout
    // cannot prune AT ALL — every slice spans the full suppkey range
    val (zBand, zTotal) = Layout.bucketsTouched(encoded, col("zbucket"), (0L, 199L), (4L, 5L))
    val (lexBand, lexTotal) = Layout.bucketsTouched(encoded, lexBucket, (0L, 199L), (4L, 5L))
    assert((zTotal, lexTotal) == (64L, 64L))
    assert(zBand == 16L, s"z layout touched $zBand buckets for the suppkey band")
    assert(lexBand == 64L, s"lex layout should touch everything, got $lexBand")
    // box predicate (pk 50..90 x sk 4..5): both prune, z prunes harder
    val (zBox, _) = Layout.bucketsTouched(encoded, col("zbucket"), (50L, 90L), (4L, 5L))
    val (lexBox, _) = Layout.bucketsTouched(encoded, lexBucket, (50L, 90L), (4L, 5L))
    assert(zBox == 4L, s"z box buckets: $zBox")
    assert(lexBox == 13L, s"lex box buckets: $lexBox")
  }

  test("writeZOrdered: range layout round-trips rows and files carry disjoint z-ranges") {
    val dir = s"/tmp/graft-test-zorder-${java.util.UUID.randomUUID().toString.take(8)}"
    Layout.writeZOrdered(encoded, dir, files = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == encoded.count())
    assert(back.agg(sum(col("zval"))).head().getLong(0) ==
      encoded.agg(sum(col("zval"))).head().getLong(0))
    // each FILE covers one contiguous, non-overlapping z-range (the
    // property footer-stats pruning relies on): file min/max ranges
    // sorted by min must not overlap
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min(col("zval")).as("lo"), max(col("zval")).as("hi"))
      .orderBy(col("lo"))
      .select("lo", "hi").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ranges.nonEmpty && ranges.size <= 16)
    ranges.init.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file z-ranges: hi=$hi lo2=$lo2")
    }
  }
}
