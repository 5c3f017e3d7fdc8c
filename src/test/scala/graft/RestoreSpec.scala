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

  // -- q92 SCD Type-2 history ------------------------------------------

  private def scd2Of(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), (col("ms") * 1000).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    Restore.scd2History(df)
      .select("user_id", "version", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, String, String, Option[String], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("scd2History: re-asserted state is a no-op; intervals chain; one open row per key") {
    // user 7: a, a (no-op), b, b (no-op), a  -> versions a/b/a
    val out = scd2Of(Seq(
      (1L, 1000L, 7L, "a"), (2L, 2000L, 7L, "a"), (3L, 3000L, 7L, "b"),
      (4L, 4000L, 7L, "b"), (5L, 5000L, 7L, "a")))
    assert(out.map(_._3) == Seq("a", "b", "a"))
    assert(out.map(_._2) == Seq(1L, 2L, 3L))
    // intervals chain: valid_to(v) == valid_from(v+1); only the last is open
    assert(out.init.zip(out.tail).forall { case (p, n) => p._5.contains(n._4) })
    assert(out.map(_._6) == Seq(false, false, true))
    assert(out.last._5.isEmpty)
  }

  test("scd2History: equal timestamps break ties on event_id; null state is a state") {
    // two changes in the same second: event_id orders them (b then c)
    val tied = scd2Of(Seq((10L, 1000L, 1L, "a"), (11L, 2000L, 1L, "b"), (12L, 2000L, 1L, "c")))
    assert(tied.map(_._3) == Seq("a", "b", "c"))
    // null -> null is "no change" (IS DISTINCT FROM semantics);
    // null -> value and value -> null each open a version
    import spark.implicits._
    val df = Seq((1L, 1000L, 2L, Some("x")), (2L, 2000L, 2L, None),
      (3L, 3000L, 2L, None), (4L, 4000L, 2L, Some("x")))
      .toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), (col("ms") * 1000).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val vs = Restore.scd2History(df).select("version", "state")
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(vs == Seq((1L, Some("x")), (2L, None), (3L, Some("x"))))
  }

  test("scd2History: corpus invariants — versions dense from 1, exactly one current per user") {
    import spark.implicits._
    val hist = Restore.scd2History(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    hist.localCheckpoint(true)
    val perUser = hist.groupBy("user_id").agg(
      max(col("version")).as("vmax"), count(lit(1)).as("n"),
      sum(when(col("is_current"), 1L).otherwise(0L)).as("open"),
      sum(when(col("valid_to").isNull && !col("is_current"), 1L).otherwise(0L)).as("badOpen"))
    assert(perUser.filter(col("vmax") =!= col("n") || col("open") =!= 1L
      || col("badOpen") =!= 0L).count() == 0)
    // change-rows-only: consecutive versions never repeat a state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    assert(hist.withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("state") <=> col("prev")).count() == 0)
  }
}
