package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ExactlyOnceSink

/** Offline state restore — the batch analog of the reference's restore/
  * module (restore/src/main/java/dev/buesing/ksd/restore/Restore.java:
  * consume the changelog topic to its end, fold last-write-wins per key
  * into a local RocksDB store, then iterate the store and replay the
  * final state to an output topic). Relationally, that entire tool is
  * ONE aggregate: rekey the changelog on the store key, keep the newest
  * version per key, drop tombstoned keys. So the Spark analog is
  *
  *  - [[stateFromChangelog]] — the fold itself, over ANY changelog
  *    frame (the q56 entry runs it over the events table, whose rows
  *    are a keyed upsert log in all but name);
  *  - [[rebuildTable]] — the same fold applied to an [[ExactlyOnceSink]]
  *    table directory, rewriting it as a single fully-compacted base
  *    under the sink's own write-then-marker commit protocol, so a
  *    crash mid-restore is invisible and a re-run is a no-op. The
  *    rebuilt directory is itself a valid sink table (one base, no
  *    deltas) readable by `ExactlyOnceSink.snapshot`.
  *
  * Scale: the fold is a single hash aggregate shuffled on the store
  * key — `max_by` partials combine map-side, so the exchange carries
  * one row per (partition, key), never the raw changelog (the §8
  * max_by-over-window lesson). No sort, no window, no driver state;
  * RocksDB's role in the reference (hold the working key→newest map)
  * is exactly what the aggregation's hash map does per partition.
  */
object Restore {

  /** Last-write-wins changelog fold: one output row per key — the row
    * with the greatest `version` — with keys whose WINNING row is a
    * tombstone deleted (the KTable contract: a tombstone shadows every
    * older version of its key; reference Streams.java:102-115).
    * `version` must totally order rows within a key for the result to
    * be deterministic (pass a struct ending in a unique column, e.g.
    * the log offset).
    *
    * A NULL-evaluating tombstone KEEPS the key (`coalesce(_, false)`),
    * matching `ExactlyOnceSink.upsertBatch`'s contract — the sink this
    * fold mirrors coalesces a null tombstone flag to "not deleted", and
    * a restore that silently dropped such keys would diverge from the
    * table it claims to rebuild.
    *
    * Output columns = input columns (key first); callers project. The
    * input must not already carry the internal `__del`/`__r` columns
    * (the sink's meta layer guarantees user tables never do).
    */
  def stateFromChangelog(changelog: DataFrame, keyCols: Seq[String],
                         version: Column, tombstone: Column): DataFrame = {
    require(!changelog.columns.exists(c => c == "__del" || c == "__r"),
      s"changelog must not contain reserved columns __del/__r: ${changelog.columns.mkString(",")}")
    // backtick-quoted resolution everywhere a NAME becomes a Column: a
    // column whose name contains a dot otherwise misparses as a nested
    // field path (quoteIfNeeded is Catalyst's own identifier quoting)
    def qcol(n: String): Column =
      col(org.apache.spark.sql.catalyst.util.quoteIfNeeded(n))
    val flagged = changelog.withColumn("__del", coalesce(tombstone, lit(false)))
    val row = struct(flagged.columns.toIndexedSeq.map(qcol): _*)
    val dataCols = changelog.columns.filterNot(keyCols.contains).toIndexedSeq
    flagged.groupBy(keyCols.map(qcol): _*)
      .agg(max_by(row, version).as("__r"))
      .filter(!col("__r.__del"))
      .select(keyCols.map(qcol) ++ dataCols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** q56: the per-user session store rebuilt from the events table read
    * as a changelog — key = user_id (the rekey: the log arrives keyed
    * by event, the store is keyed by user), version = (ts, event_id)
    * (event_id unique ⇒ total order even on coarse-timestamp ties —
    * the s09 deterministic-winner discipline), tombstone = an 'error'
    * event (the newest record being an error closes the key, the way a
    * null value deletes a KTable entry). Null-safe `<=>`: a NULL
    * event_type is NOT a tombstone — the key survives — mirroring the
    * sink contract and the oracle's `IS DISTINCT FROM 'error'` filter.
    */
  def restoreState(events: DataFrame): DataFrame =
    stateFromChangelog(events, Seq("user_id"),
      struct(col("ts"), col("event_id")),
      col("event_type") <=> lit("error"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))

  /** Rebuild an [[ExactlyOnceSink]] table at `sinkDir` into `outDir` as
    * one fully-compacted committed base (newest version per key,
    * tombstones dropped — nothing older remains for them to shadow),
    * at the sink's latest committed version. The reference tool's
    * "replay the store to the restore topic" step is this write.
    *
    * Crash/idempotence contract (spec-pinned, RestoreSpec):
    *  - the data files are written BEFORE the commit marker, so a crash
    *    mid-restore leaves an unmarked — invisible — directory that the
    *    retry simply overwrites (the sink's own delta protocol);
    *  - a re-run against an already-restored `outDir` is a no-op (the
    *    target version's marker already exists);
    *  - the meta JSON is copied byte-for-byte first, so a restored
    *    directory is `snapshot`-readable even between data and marker.
    *
    * Returns the restored version, or None when `sinkDir` has no
    * committed state yet.
    */
  def rebuildTable(spark: SparkSession, sinkDir: String, outDir: String): Option[Long] = {
    val last = ExactlyOnceSink.committedVersions(spark, sinkDir).lastOption
    last.foreach { v =>
      val f = ExactlyOnceSink.fs(spark, outDir)
      val target = new Path(s"$outDir/base/v=$v")
      val marker = new Path(target, ExactlyOnceSink.Marker)
      if (!f.exists(marker)) {
        copyMeta(spark, sinkDir, outDir)
        val (keyCols, _) = ExactlyOnceSink.readMeta(spark, sinkDir)
        ExactlyOnceSink.resolved(spark, sinkDir, keyCols).foreach { r =>
          r.filter(!col(ExactlyOnceSink.DelCol))
            .write.mode("overwrite").parquet(target.toString)
          f.create(marker, true).close()
        }
      }
    }
    last
  }

  /** q92: SCD TYPE-2 HISTORY — the point-in-time flip side of q56.
    * [[stateFromChangelog]] answers "what is the state NOW"; a warehouse
    * dimension answers "what was the state at time T", and the standard
    * answer is the slowly-changing-dimension type-2 table (Kimball):
    * one row per (key, state version) with a validity interval
    * [valid_from, valid_to), open (`valid_to` NULL, `is_current` true)
    * for the latest version. The reference's changelog topic IS the
    * input shape (Restore.java consumes it to the end; this operator
    * folds the SAME log into history instead of last-write-wins).
    *
    * Change detection: a new version opens only when the tracked
    * attribute (`event_type`) actually CHANGES (`IS DISTINCT FROM` the
    * previous row's value — null-safe, so null→null is "no change"),
    * not on every log record: re-asserting the same state is an upsert
    * no-op, the Kimball type-2 rule.
    *
    * Ordering: (epoch microseconds, event_id) — the q56 tie-break. The
    * event_id tiebreak makes the fold deterministic under equal
    * timestamps, and µs-epoch keeps Spark and a ns-precision replay
    * engine ordering identically (§8 NTZ/ns lesson).
    *
    * Scale shape: both window passes (lag for change detection,
    * row_number/lead for versioning) share ONE partitioning and sort
    * key — (user_id | ts, event_id) — so the plan carries a single
    * exchange and a single sort; per-key history is bounded by per-key
    * activity, never corpus-sized. No driver state, no collect.
    *
    * Output: (user_id, version, state, valid_from, valid_to,
    * is_current) — timestamps formatted (the q56 convention), `version`
    * 1-based per key in validity order.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      // first row per key: prev_type null; IS DISTINCT FROM opens it
      .filter(!(col("event_type") <=> col("prev_type")))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
  }

  /** Byte-for-byte copy of the sink's meta JSON (keyCols/dataCols/txn
    * offsets) — restore transports the table description, it does not
    * reinterpret it.
    */
  private def copyMeta(spark: SparkSession, from: String, to: String): Unit = {
    val src = ExactlyOnceSink.fs(spark, from)
    val dst = ExactlyOnceSink.fs(spark, to)
    val in = src.open(new Path(from, ExactlyOnceSink.MetaFile))
    val bytes = try in.readAllBytes() finally in.close()
    val out = dst.create(new Path(to, ExactlyOnceSink.MetaFile), true)
    try out.write(bytes) finally out.close()
  }
}
