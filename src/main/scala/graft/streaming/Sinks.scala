package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once delivery into a keyed table — the Spark analog of the
  * reference's end-to-end EOS contract (streams config
  * `processing.guarantee=exactly_once_v2`, Streams.java:35-49, plus the
  * transactional publisher, publisher/src/main/java/dev/buesing/ksd/
  * publisher/Producer.java). Structured Streaming gives at-least-once
  * delivery into `foreachBatch` with a MONOTONIC batchId; exactly-once
  * is recovered by making the batch commit idempotent:
  *
  *  - every batch writes a full new SNAPSHOT version dir `v=<batchId>`
  *    and marks it with a commit file only after the write succeeds
  *    (write-then-commit, the miniature of the Delta/Iceberg log
  *    protocol);
  *  - a replayed batchId ≤ the last committed version is SKIPPED —
  *    duplicate delivery after a checkpoint recovery changes nothing;
  *  - readers only see marker-committed versions, so a crash mid-write
  *    leaves no torn state (the orphan dir is overwritten on retry).
  *
  * Rows upsert by key: new keys append, re-sent keys replace — the
  * idempotent keyed MERGE. At production scale the same foreachBatch
  * body targets a real transactional table format (Delta MERGE INTO /
  * Iceberg); the snapshot-rewrite here keeps the protocol visible and
  * dependency-free.
  */
object ExactlyOnceSink {

  private val Marker = "_graft_committed"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** batchIds of committed versions, ascending. */
  def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, Marker)))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** The latest committed snapshot (empty-schema-less: caller must have
    * committed at least one batch; returns None before that).
    */
  def snapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    committedVersions(spark, dir).lastOption.map { v =>
      spark.read.parquet(s"$dir/v=$v")
    }

  /** The idempotent keyed MERGE body for `foreachBatch`. Usage:
    *   stream.writeStream.foreachBatch(upsertBatch(dir, Seq("k")) _)
    *
    * Within-batch collapse: if a single trigger can carry SEVERAL rows
    * per key (changelog/append producers), pass `versionCol` — the
    * row with the greatest version wins, deterministically. Without
    * it, the input contract is at-most-one-row-per-key-per-batch
    * (update-mode aggregation output); violations throw rather than
    * silently keeping an arbitrary row.
    */
  def upsertBatch(dir: String, keyCols: Seq[String],
                  versionCol: Option[String] = None)
                 (batch: Dataset[Row], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val last = committedVersions(spark, dir).lastOption.getOrElse(-1L)
    if (batchId <= last) return // duplicate delivery: already committed

    val deduped = versionCol match {
      case Some(v) =>
        val keyStruct = struct(keyCols.map(col): _*)
        val rowStruct = struct(batch.columns.map(col): _*)
        batch.groupBy(keyStruct.as("k"))
          .agg(max_by(rowStruct, col(v)).as("r"))
          .select(col("r.*"))
      case None =>
        val d = batch.dropDuplicates(keyCols)
        if (d.count() != batch.count())
          throw new IllegalArgumentException(
            s"batch $batchId carries multiple rows per key ${keyCols.mkString(",")}; " +
              "pass versionCol to define which row wins")
        d
    }
    val merged = snapshot(spark, dir) match {
      case None => deduped
      case Some(prev) =>
        prev.join(deduped, keyCols, "left_anti").unionByName(deduped)
    }
    val target = s"$dir/v=$batchId"
    merged.write.mode("overwrite").parquet(target)
    fs(spark, dir).create(new Path(target, Marker), true).close()

    // retention: keep the previous committed snapshot (reader may hold
    // it) and drop older ones — state is 2 snapshots, not the history
    val f = fs(spark, dir)
    committedVersions(spark, dir).dropRight(2)
      .foreach(v => f.delete(new Path(s"$dir/v=$v"), true))
  }
}

/** Continuously-updated dimension semantics for stream-static joins —
  * the GlobalKTable/KTable contract (Streams.java:102-115): the dim
  * table keeps changing while the stream runs, and each microbatch must
  * join against the CURRENT dim, not the one captured at plan time. A
  * static DataFrame in a stream-static join pins its file listing when
  * the plan is built; re-reading the dim INSIDE `foreachBatch` re-lists
  * and re-scans per microbatch — rate-limited dim refresh at exactly
  * microbatch granularity (the dim is broadcast per batch, so the cost
  * is one small-dim scan per trigger, never a fact shuffle).
  */
object RefreshingDim {

  /** Enrich a line-item stream with prices from the parquet dim at
    * `dimDir`, re-read every microbatch; enriched rows append to
    * `sinkDir`. Returns the started query.
    */
  def enrichPriceQuery(lineitemStream: DataFrame, dimDir: String,
                       sinkDir: String, checkpoint: String) =
    lineitemStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val dim = spark.read.parquet(dimDir) // fresh snapshot, fresh listing
        // one directory per batchId, OVERWRITTEN on write: a batch
        // replayed after checkpoint recovery rewrites its own partition
        // instead of appending duplicates (blind append is not
        // replay-idempotent; partition discovery on the read side
        // exposes batch_id as a column)
        batch.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
            col("l_quantity"), col("p_retailprice").as("price"))
          .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
        ()
      }
      .start()
}
