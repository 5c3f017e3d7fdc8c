package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed/partitioned table writes — the storage side of the
  * reference's co-partitioned-topics contract (builder/src/main/java/
  * dev/buesing/ksd/builder/BuildSystem.java creates the users/products
  * tables with matching partition counts so KTable joins never
  * re-shuffle). In Spark the analog is bucketed tables: two tables
  * bucketed (and optionally sorted) on the join key with the same
  * bucket count join with NO exchange on either side — at 100 TB that
  * turns every repeated fact⋈fact join on the bucket key into a local
  * zip of pre-sorted buckets.
  */
object TableWriter {

  /** Write `df` as a parquet table bucketed on `bucketCol`. Pick
    * `numBuckets` so one bucket ≈ one task's worth of data at target
    * scale (the same sizing rule as the reference's topic partition
    * counts).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    // repartition on the bucket column FIRST: without it every
    // upstream task writes one file per bucket it touches (up to
    // tasks×buckets small files), and the scan only reports the
    // bucket sort order when each bucket is exactly one file — with
    // more, the promised sorted-bucket zip silently degrades to a
    // full re-sort on both join sides
    val w = df.repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Write `df` partitioned by a (low-cardinality!) column — partition
    * pruning makes per-key scans O(selected partitions), the batch
    * analog of reading one topic partition.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
