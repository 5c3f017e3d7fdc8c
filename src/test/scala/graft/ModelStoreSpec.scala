package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** ModelStore round-trip contracts (r13): for each frozen-model
  * family, batch-train → SAVE → LOAD → run the streaming twin with
  * the LOADED artifact (never the in-process value) → assert
  * row-exact equality against the batch operator. This is the
  * serialize/load handoff a production ingest service performs —
  * the reference's analog is bootstrapping KTable state from its
  * compacted topics (Streams.java:102-115) before the stream flows.
  */
class ModelStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.Tables
  import graft.streaming.StreamOps

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"modelstore_$name").toString

  test("manifest contract: fields round-trip; wrong family refuses; uncommitted dir refuses") {
    import spark.implicits._
    val dir = tmp("manifest")
    val m = ModelStore.save(spark, dir, "kmeans", 12L,
      Map("k" -> "8", "note" -> "quote\" and ,comma"),
      Map("centroids" -> Seq((1, Seq(1L, 2L))).toDF("cid", "vec")))
    val back = ModelStore.manifest(spark, dir)
    assert(back.family == "kmeans" && back.version == 12L)
    assert(back.params("note") == "quote\" and ,comma", "params must JSON-round-trip exactly")
    assert(back.tables == Seq("centroids"))
    assert(back.createdUtcMs == m.createdUtcMs)
    // family check: a PQ loader pointed at a kmeans model must fail loudly
    val e = intercept[IllegalArgumentException](ModelStore.load(spark, dir, "pq"))
    assert(e.getMessage.contains("family"))
    // crash simulation: tables present but no commit marker → refused
    val crashed = tmp("crashed")
    Seq((1, Seq(1L))).toDF("cid", "vec").write.parquet(s"$crashed/tables/centroids")
    val e2 = intercept[IllegalArgumentException](ModelStore.manifest(spark, crashed))
    assert(e2.getMessage.contains("no committed model"))
    // re-save over a prior model replaces it (the failed-attempt path)
    ModelStore.save(spark, dir, "kmeans", 13L, Map.empty,
      Map("centroids" -> Seq((2, Seq(9L))).toDF("cid", "vec")))
    assert(ModelStore.manifest(spark, dir).version == 13L)
    assert(ModelStore.loadKmeans(spark, dir) == Seq((2, Seq(9L))))
  }

  test("kmeans: stream from the LOADED artifact is row-exact vs batch q60") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val batch = graft.operators.Similarity.kmeansAssign(embs, k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cents = graft.operators.Similarity.kmeansCentroids(embs, k = 8, iters = 3)
    val dir = tmp("kmeans")
    ModelStore.saveKmeans(spark, dir, cents, version = 1L)
    val loaded = ModelStore.loadKmeans(spark, dir)
    assert(loaded == cents.sortBy(_._1), "centroids must round-trip bit-exact")

    val source = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.Map[Long, (Long, Long)]()
    val q = StreamOps.streamKmeansAssign(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.KmAssign], _: Long) =>
        b.collect().foreach(r => got(r.vec_id) = (r.cluster, r.d2)); ()
      }.start()
    try {
      val rows = embs.select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      rows.grouped(rows.length / 2 + 1).foreach { ch =>
        source.addData(ch.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q60")
  }

  test("pq: stream from the LOADED codebook is row-exact vs batch q65") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val batch = graft.operators.Similarity.pqCodes(embs, kcode = 16, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val book = graft.operators.Similarity.pqCodebook(embs, kcode = 16, iters = 3)
    val dir = tmp("pq")
    ModelStore.savePq(spark, dir, book, version = 3L)
    assert(ModelStore.manifest(spark, dir).params("kcode") == "16")
    val loaded = ModelStore.loadPq(spark, dir)
    assert(loaded == book, "codebook must round-trip bit-exact")

    val source = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.Map[(Long, Long), (Long, Long)]()
    val q = StreamOps.streamPqEncode(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PqCode], _: Long) =>
        b.collect().foreach(r => got((r.vec_id, r.sub)) = (r.code, r.d2)); ()
      }.start()
    try {
      val rows = embs.select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      source.addData(rows.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q65")
  }

  test("sq8: stream from the LOADED grid is row-exact vs batch q82") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val batch = graft.operators.Similarity.sq8Codes(embs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val grid = graft.operators.Similarity.sq8Grid(embs)
    val dir = tmp("sq8")
    ModelStore.saveSq8(spark, dir, grid, version = 2L)
    val loaded = ModelStore.loadSq8(spark, dir)
    assert(loaded == grid, "grid must round-trip bit-exact, position order preserved")

    val source = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.Map[(Long, Long), (Long, Long)]()
    val q = StreamOps.streamSq8Encode(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.Sq8Code], _: Long) =>
        b.collect().foreach(r => got((r.vec_id, r.pos)) = (r.code, r.err)); ()
      }.start()
    try {
      val rows = embs.select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      source.addData(rows.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q82")
  }

  test("bpe: stream from the LOADED rules is row-exact vs batch q68") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val batch = graft.operators.Bpe.bpeEncode(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val rulesDf = graft.operators.Bpe.bpeTrain(d)
    val dir = tmp("bpe")
    ModelStore.saveBpeRules(spark, dir, rulesDf, version = 24L,
      params = Map("merges" -> "24", "vocabCap" -> "256"))
    val loaded = ModelStore.loadBpeRules(spark, dir)
    assert(loaded.size == 24, "rank-ordered rule list must load complete")
    assert(loaded == rulesDf.collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq)

    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[Long, (Long, String)]()
    val q = StreamOps.streamBpeEncode(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.BpeDoc], _: Long) =>
        b.collect().foreach(r => got(r.doc_id) = (r.n_subwords, r.subtext)); ()
      }.start()
    try {
      val rows = d.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      source.addData(rows.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q68")
  }

  test("source_quota: stream from the LOADED config admits exactly batch q90's set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val targets = Map("src0" -> 3000, "src1" -> 2500, "src2" -> 1500, "src3" -> 500)
    val vocab = graft.operators.TextOps.tokenizerVocabSeq(docs, m = 64, maxN = 4)
    val rates = graft.operators.TextOps.sourceQuotaRates(docs, targets, vocab)
    val batch = graft.operators.TextOps.sourceQuota(docs, targets, vocab)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val dir = tmp("quota")
    ModelStore.saveSourceQuota(spark, dir, rates, vocab, maxN = 4, version = 5L)
    val (lr, lv, lm) = ModelStore.loadSourceQuota(spark, dir)
    assert(lr == rates && lv == vocab && lm == 4,
      "rates, vocab ORDER, and maxN must all round-trip")

    val source = MemoryStream[(Long, String, String)]
    val admitted = collection.mutable.Map[Long, (String, Long)]()
    val q = StreamOps.streamSourceQuota(source.toDS(), lr, lv, lm)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.QuotaAdmit], _: Long) =>
        b.collect().foreach(r => admitted(r.doc_id) = (r.source, r.n_tokens)); ()
      }.start()
    try {
      val rows = docs.select(col("doc_id"), col("source"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      rows.grouped(rows.length / 2 + 1).foreach { ch =>
        source.addData(ch.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(admitted.toMap == batch, "loaded-config admission must equal batch q90")
  }

  test("zgrid: stream from the LOADED grid is row-exact vs batch q93's encode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Layout
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val grid = Layout.zGrid(li)
    val dir = tmp("zgrid")
    ModelStore.saveZGrid(spark, dir, grid, version = 9L)
    val (pmin, pmax, smin, smax) = ModelStore.loadZGrid(spark, dir)
    assert((pmin, pmax, smin, smax) == grid)
    val batch = Layout.zorderEncode(li).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(4), r.getLong(5)))).toMap
    val rows = li.as[(Long, Int, Long, Long)].collect()
    val got = collection.mutable.Map[(Long, Int), (Long, Long)]()
    val source = MemoryStream[(Long, Int, Long, Long)]
    val q = Layout.zEncodeFrozen(
        source.toDS().toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        pmin, pmax, smin, smax)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got((r.getLong(0), r.getInt(1))) = ((r.getLong(4), r.getLong(5))))
        ()
      }.start()
    try { source.addData(rows.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    assert(got.toMap == batch, "loaded-grid stream encode must equal batch q93")
  }

  test("dup_windows: the duplication-sized family round-trips without a collect on the save path") {
    val docs = Tables.documents(spark, sfDir)
    val dup = graft.operators.ExactSubstr.dupWindowTable(docs, k = 6)
    assert(dup.nonEmpty, "corpus must have planted dup windows for this test to bite")
    val dir = tmp("dup")
    ModelStore.saveDupTable(spark, dir, dup, version = 4L)
    assert(ModelStore.loadDupTable(spark, dir) == dup,
      "digest -> first-occurrence map must round-trip exactly")
    // the scale path: the parquet frame itself, for stream-static joins
    assert(ModelStore.loadDupTableDf(spark, dir).count() == dup.size)
  }
}
