package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q93: Z-ORDER data layout — the multi-dimensional clustering pass a
  * 100 TB table gets before it is written (Delta OPTIMIZE ZORDER /
  * Iceberg sort-order rewrite): interleave the bits of the clustering
  * keys so that a file (bucket) of consecutive z-values covers a
  * RECTANGLE of the key space, giving min/max-stats pruning on EVERY
  * clustering dimension — where a lexicographic sort prunes only its
  * leading column.
  *
  * The encode is deterministic integer arithmetic end to end:
  *  1. each key is range-scaled to the 16-bit grid with the table's
  *     own min/max — ((v - min) · 65535) div (max - min) — the q82
  *     SQ8 grid discipline (one cheap global aggregate, a bounded
  *     1-row collect, the q88 scalar pattern: a constant-key join
  *     would fold to BNLJ);
  *  2. the two 16-bit grid coordinates interleave into a 32-bit
  *     z-value (x in even bits, y in odd);
  *  3. zbucket = zval div 2²⁶ — 64 buckets = the top 3 interleaved
  *     bits of each dimension, an 8×8 grid tile per bucket.
  *
  * Scale shape: the stats aggregate is one map-side-combined pass;
  * the encode itself is a pure map (zero exchange). The LAYOUT step
  * ([[writeZOrdered]]) is one range exchange on zval — exactly the
  * shuffle the table write would pay for any clustered layout.
  *
  * Pruning claim (LayoutSpec, measured not asserted-by-faith): on the
  * 64-bucket layout each bucket's (partkey, suppkey) min/max box is a
  * grid tile, so a predicate on EITHER key overlaps ~1/8 of the
  * buckets, where the lexicographic layout prunes suppkey-only
  * predicates not at all (every partkey slice spans the full suppkey
  * range).
  */
object Layout {

  final val GridBits = 16
  final val GridMax = (1 << GridBits) - 1 // 65535
  final val Buckets = 64 // zval >> 26

  /** Bit interleave of two 16-bit grid coordinates: x in even bits,
    * y in odd bits — 32 codegen'd integer terms, no UDF.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until GridBits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** The same 32 terms as SQL text (over columns named zx / zy) so the
    * DuckDB oracle replays the interleave verbatim.
    */
  def interleaveSql(x: String = "zx", y: String = "zy"): String =
    (0 until GridBits).map { b =>
      s"(($x >> $b) & 1) * ${1L << (2 * b)} + (($y >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")

  /** q93 registered encode: lineitem keyed on (l_partkey, l_suppkey),
    * grid = the table's own min/max (in-range by construction, so the
    * frozen encode's clamp is the identity and the oracle replays the
    * plain scale). Output: (l_orderkey, l_linenumber, l_partkey,
    * l_suppkey, zval, zbucket).
    */
  def zorderEncode(lineitem: DataFrame): DataFrame = {
    val (pmin, pmax, smin, smax) = zGrid(lineitem)
    zEncodeFrozen(lineitem, pmin, pmax, smin, smax)
  }

  /** s50: the q93 encode against a FROZEN grid (the s40 SQ8 contract):
    * a stream cannot re-derive global min/max per batch without the
    * encoding of old rows drifting, so the grid is solved offline on
    * the reference corpus and novel out-of-range keys CLAMP to the
    * grid edge (deterministic, order-free — the s40 clamping rule).
    * With the grid = the batch min/max, in-range rows encode
    * bit-identically to [[zorderEncode]] (spec-pinned).
    */
  def zEncodeFrozen(rows: DataFrame, pmin: Long, pmax: Long,
                    smin: Long, smax: Long): DataFrame = {
    def clamped(v: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else expr(s"CAST(((least(greatest($v, $lo), $hi) - $lo) * 65535) DIV ${hi - lo} AS BIGINT)")
    rows
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        clamped("l_partkey", pmin, pmax).as("zx"),
        clamped("l_suppkey", smin, smax).as("zy"))
      .withColumn("zval", interleave16(col("zx"), col("zy")))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("zval"),
        shiftright(col("zval"), 26).as("zbucket"))
  }

  /** The frozen q93 grid (pmin, pmax, smin, smax) for s50 — a 1-row
    * collect (the q88 scalar protocol).
    */
  def zGrid(lineitem: DataFrame): (Long, Long, Long, Long) = {
    val r = lineitem.agg(
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    (Option(r.get(0)).fold(0L)(_ => r.getLong(0)),
      Option(r.get(1)).fold(0L)(_ => r.getLong(1)),
      Option(r.get(2)).fold(0L)(_ => r.getLong(2)),
      Option(r.get(3)).fold(0L)(_ => r.getLong(3)))
  }

  /** The physical layout: range-partition on zval (one exchange — the
    * write-side shuffle ANY clustered layout pays) with an
    * intra-partition sort, so each output file covers one contiguous
    * z-range and its parquet footer min/max box is a key-space tile.
    */
  def writeZOrdered(encoded: DataFrame, dir: String, files: Int = Buckets): Unit =
    encoded.repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(dir)

  /** File-pruning simulation over a bucketed layout: the buckets whose
    * (pk, sk) min/max box — exactly what a parquet footer stores —
    * overlaps the query box. Returns (buckets touched, total buckets).
    */
  def bucketsTouched(encoded: DataFrame, bucket: Column,
                     pkRange: (Long, Long), skRange: (Long, Long)): (Long, Long) = {
    val stats = encoded.groupBy(bucket.as("b")).agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
      .localCheckpoint(true)
    val touched = stats.filter(
      col("pmax") >= pkRange._1 && col("pmin") <= pkRange._2 &&
        col("smax") >= skRange._1 && col("smin") <= skRange._2).count()
    (touched, stats.count())
  }
}
