package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Offline restore (operators.Restore) — the changelog fold's contract
  * and rebuildTable's crash/idempotence protocol, which Restore.scala's
  * scaladoc pins to this spec.
  */
class RestoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Restore
  import graft.streaming.ExactlyOnceSink

  private def freshDir(name: String): String = {
    val dir = new java.io.File(s"/tmp/graft-test-$name")
    if (dir.exists()) { import scala.reflect.io.Directory; new Directory(dir).deleteRecursively() }
    dir.getAbsolutePath
  }

  test("stateFromChangelog: last write wins, tombstone drops, NULL tombstone keeps") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "a", Some(false)), // k=1: overwritten by v=2
      (1L, 2L, "b", Some(false)),
      (2L, 1L, "c", Some(true)),  // k=2: newest row is a tombstone -> dropped
      (3L, 1L, "d", None),        // k=3: NULL tombstone flag -> KEPT
      (4L, 2L, "e", Some(false)), // k=4: tombstone SHADOWED by newer write
      (4L, 1L, "x", Some(true))
    ).toDF("k", "v", "payload", "del")
    val out = Restore.stateFromChangelog(log, Seq("k"), col("v"), col("del"))
      .select("k", "payload").as[(Long, String)].collect().sortBy(_._1).toSeq
    // the sink contract (ExactlyOnceSink.upsertBatch coalesces a null
    // tombstone to false): k=3 must survive, not be silently deleted
    assert(out == Seq((1L, "b"), (3L, "d"), (4L, "e")))
  }

  test("stateFromChangelog: dotted column names round-trip; reserved names refused") {
    import spark.implicits._
    val dotted = Seq((1L, 1L, "old"), (1L, 2L, "new"))
      .toDF("k", "v", "payload.dotted")
    val out = Restore.stateFromChangelog(dotted, Seq("k"), col("v"), lit(false))
    assert(out.columns.toSeq == Seq("k", "v", "payload.dotted"))
    assert(out.select(col("`payload.dotted`")).as[String].collect().toSeq == Seq("new"))

    val clash = Seq((1L, 1L)).toDF("k", "__del")
    val e = intercept[IllegalArgumentException] {
      Restore.stateFromChangelog(clash, Seq("k"), col("k"), lit(false))
    }
    assert(e.getMessage.contains("__del"))
  }

  test("rebuildTable: compacted base round-trips through snapshot; tombstones gone") {
    import spark.implicits._
    val sinkDir = freshDir("restore-src")
    val outDir = freshDir("restore-out")
    // three batches: inserts, an update, a tombstone for key 2
    ExactlyOnceSink.upsertBatch(sinkDir, Seq("k"))(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total"), 0L)
    ExactlyOnceSink.upsertBatch(sinkDir, Seq("k"))(
      Seq((1L, 11.0), (3L, 30.0)).toDF("k", "total"), 1L)
    ExactlyOnceSink.upsertBatch(sinkDir, Seq("k"), tombstoneCol = Some("del"))(
      Seq((2L, 0.0, true)).toDF("k", "total", "del"), 2L)

    val v = Restore.rebuildTable(spark, sinkDir, outDir)
    assert(v.contains(2L))
    // restored dir is a valid sink table: exactly one committed base at
    // the restored version, zero deltas
    assert(ExactlyOnceSink.committedBases(spark, outDir) == Seq(2L))
    assert(ExactlyOnceSink.committedDeltas(spark, outDir).isEmpty)
    val restored = ExactlyOnceSink.snapshot(spark, outDir).get
      .collect().map(_.toString).sorted.toSeq
    val live = ExactlyOnceSink.snapshot(spark, sinkDir).get
      .collect().map(_.toString).sorted.toSeq
    assert(restored == live)
    assert(!restored.exists(_.startsWith("[2,"))) // tombstoned key physically absent
  }

  test("rebuildTable: empty source is None; crash window invisible; retry + re-run no-op") {
    import spark.implicits._
    val sinkDir = freshDir("restore-src2")
    val outDir = freshDir("restore-out2")
    assert(Restore.rebuildTable(spark, sinkDir, outDir).isEmpty) // nothing committed yet

    ExactlyOnceSink.upsertBatch(sinkDir, Seq("k"))(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total"), 0L)
    assert(Restore.rebuildTable(spark, sinkDir, outDir).contains(0L))

    // CRASH between the data write and the marker: simulated by deleting
    // the marker the completed rebuild just wrote — on-disk state is
    // exactly the crash window's (meta + full data, no marker)
    val f = ExactlyOnceSink.fs(spark, outDir)
    val marker = new org.apache.hadoop.fs.Path(s"$outDir/base/v=0/_graft_committed")
    assert(f.delete(marker, false))
    // invisible: no committed version, snapshot sees no state
    assert(ExactlyOnceSink.committedBases(spark, outDir).isEmpty)
    assert(ExactlyOnceSink.snapshot(spark, outDir).isEmpty)

    // RETRY overwrites the unmarked dir and commits
    assert(Restore.rebuildTable(spark, sinkDir, outDir).contains(0L))
    assert(ExactlyOnceSink.snapshot(spark, outDir).get.count() == 2)

    // RE-RUN against the restored dir is a no-op: marker already present,
    // data files untouched (same names, same mtimes)
    def listing(): Seq[(String, Long)] =
      f.listStatus(new org.apache.hadoop.fs.Path(s"$outDir/base/v=0")).toSeq
        .map(s => (s.getPath.getName, s.getModificationTime)).sortBy(_._1)
    val before = listing()
    assert(Restore.rebuildTable(spark, sinkDir, outDir).contains(0L))
    assert(listing() == before)
  }
}
