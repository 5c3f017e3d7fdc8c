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

  test("integrity (r14): a tampered table refuses at load with the table named") {
    import spark.implicits._
    val dir = tmp("tamper")
    ModelStore.save(spark, dir, "kmeans", 1L, Map.empty,
      Map("centroids" -> Seq((1, Seq(1L, 2L)), (2, Seq(3L, 4L))).toDF("cid", "vec")))
    // sanity: the untampered artifact loads
    ModelStore.load(spark, dir, "kmeans")
    // tamper: swap a value in the parquet UNDER the committed manifest
    Seq((1, Seq(1L, 2L)), (2, Seq(3L, 5L))).toDF("cid", "vec")
      .write.mode("overwrite").parquet(s"$dir/tables/centroids")
    val e = intercept[IllegalArgumentException](ModelStore.load(spark, dir, "kmeans"))
    assert(e.getMessage.contains("integrity") && e.getMessage.contains("centroids"))
    // digest is content-based, not layout-based: the same rows written
    // with a different partitioning still load
    val dir2 = tmp("relayout")
    ModelStore.save(spark, dir2, "kmeans", 1L, Map.empty,
      Map("centroids" -> Seq((1, Seq(1L, 2L)), (2, Seq(3L, 4L))).toDF("cid", "vec")))
    Seq((2, Seq(3L, 4L)), (1, Seq(1L, 2L))).toDF("cid", "vec").repartition(3)
      .write.mode("overwrite").parquet(s"$dir2/tables/centroids")
    assert(ModelStore.loadKmeans(spark, dir2) == Seq((1, Seq(1L, 2L)), (2, Seq(3L, 4L))),
      "row/partition order must not affect the digest")
    // a manifest WITHOUT digests (pre-r14 format) refuses as unverifiable
    val m3 = tmp("legacy")
    ModelStore.save(spark, m3, "kmeans", 1L, Map.empty,
      Map("centroids" -> Seq((1, Seq(1L))).toDF("cid", "vec")))
    val mf = new java.io.File(m3, ModelStore.ManifestFile)
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath))
    val stripped = txt.replaceAll(""","digests":\{[^}]*\}""", "")
    assert(stripped != txt, "test must actually strip the digests node")
    java.nio.file.Files.write(mf.toPath, stripped.getBytes)
    // drop the local-fs CRC sidecar the out-of-band rewrite invalidated
    new java.io.File(m3, s".${ModelStore.ManifestFile}.crc").delete()
    val e2 = intercept[IllegalArgumentException](ModelStore.load(spark, m3, "kmeans"))
    assert(e2.getMessage.contains("no content digest"))
  }

  test("row-count proxy (r16): skip-path families refuse truncated state; pre-r16 manifests fall back to the full digest") {
    import spark.implicits._
    // a duplication-sized family skips the digest recompute — the
    // cheap row-count proxy must still catch a truncated table
    val dir = tmp("proxy")
    ModelStore.save(spark, dir, "dup_windows", 1L, Map.empty,
      Map("win" -> Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("h", "pos")))
    ModelStore.load(spark, dir, "dup_windows") // sanity: loads
    Seq(("a", 1L), ("b", 2L)).toDF("h", "pos")
      .write.mode("overwrite").parquet(s"$dir/tables/win")
    val e = intercept[IllegalArgumentException](
      ModelStore.load(spark, dir, "dup_windows"))
    assert(e.getMessage.contains("row-count proxy") && e.getMessage.contains("win"))
    // same-count corruption slips the proxy BY DESIGN (the documented
    // trade) — but verifyLarge=true still catches it via the digest
    val dir2 = tmp("proxy2")
    ModelStore.save(spark, dir2, "dup_windows", 1L, Map.empty,
      Map("win" -> Seq(("a", 1L), ("b", 2L)).toDF("h", "pos")))
    Seq(("a", 1L), ("b", 9L)).toDF("h", "pos")
      .write.mode("overwrite").parquet(s"$dir2/tables/win")
    ModelStore.load(spark, dir2, "dup_windows") // proxy passes (2 rows)
    val e2 = intercept[IllegalArgumentException](
      ModelStore.load(spark, dir2, "dup_windows", verifyLarge = true))
    assert(e2.getMessage.contains("integrity"))
    // a pre-r16 manifest (no rows node) forces the full digest path
    // even for skip families: integrity unknown is not integrity waived
    val dir3 = tmp("proxy3")
    ModelStore.save(spark, dir3, "dup_windows", 1L, Map.empty,
      Map("win" -> Seq(("a", 1L)).toDF("h", "pos")))
    val mf = new java.io.File(dir3, ModelStore.ManifestFile)
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath))
    val stripped = txt.replaceAll(""","rows":\{[^}]*\}""", "")
    assert(stripped != txt, "test must actually strip the rows node")
    java.nio.file.Files.write(mf.toPath, stripped.getBytes)
    new java.io.File(dir3, s".${ModelStore.ManifestFile}.crc").delete()
    Seq(("zz", 1L)).toDF("h", "pos") // same count, different content
      .write.mode("overwrite").parquet(s"$dir3/tables/win")
    val e3 = intercept[IllegalArgumentException](
      ModelStore.load(spark, dir3, "dup_windows"))
    assert(e3.getMessage.contains("integrity"))
  }

  test("lifecycle (r14): listVersions sees only committed dirs; gc keeps newest; pins ignore supersedes") {
    import spark.implicits._
    val base = tmp("versions")
    def saveV(v: Long, cid: Int): Unit =
      ModelStore.save(spark, ModelStore.versionDir(base, v), "kmeans", v,
        Map.empty, Map("centroids" -> Seq((cid, Seq(cid.toLong))).toDF("cid", "vec")))
    saveV(1L, 1); saveV(2L, 2); saveV(3L, 3)
    // an uncommitted crash leftover is invisible
    Seq((9, Seq(9L))).toDF("cid", "vec")
      .write.parquet(s"${ModelStore.versionDir(base, 9L)}/tables/centroids")
    assert(ModelStore.listVersions(spark, base) == Seq(1L, 2L, 3L))
    // pinned load ignores the newer supersede; unpinned takes newest
    assert(ModelStore.resolve(spark, base) == ModelStore.versionDir(base, 3L))
    val pinned = ModelStore.resolve(spark, base, Some(2L))
    assert(ModelStore.loadKmeans(spark, pinned) == Seq((2, Seq(2L))))
    intercept[IllegalArgumentException](ModelStore.resolve(spark, base, Some(7L)))
    // gc: drops 1, keeps 2..3, never touches the uncommitted dir
    assert(ModelStore.gc(spark, base, keepN = 2) == Seq(1L))
    assert(ModelStore.listVersions(spark, base) == Seq(2L, 3L))
    assert(new java.io.File(s"${ModelStore.versionDir(base, 9L)}/tables/centroids").exists)
    // gc(1) keeps exactly the newest; keepN = 0 refuses
    assert(ModelStore.gc(spark, base, keepN = 1) == Seq(2L))
    assert(ModelStore.listVersions(spark, base) == Seq(3L))
    intercept[IllegalArgumentException](ModelStore.gc(spark, base, keepN = 0))
    assert(ModelStore.loadKmeans(spark,
      ModelStore.resolve(spark, base)) == Seq((3, Seq(3L))))
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

  test("bm25: stream from the LOADED term index is row-exact vs batch q62") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val batch = graft.operators.TextOps.bm25Search(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val index = StreamOps.bm25Index(docs)
    val dir = tmp("bm25")
    ModelStore.saveBm25(spark, dir, index, version = 2L)
    val loaded = ModelStore.loadBm25(spark, dir)
    assert(loaded == index, "term idf map + corpus scalars must round-trip exactly")

    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[(String, Long), (Long, Long)]()
    val q = StreamOps.streamBm25(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.Bm25Hit], _: Long) =>
        val rows = b.collect()
        rows.map(_.token).distinct.foreach(t =>
          got.keys.filter(_._1 == t).toSeq.foreach(got.remove))
        rows.foreach(r => got((r.token, r.rank)) = (r.doc_id, r.score_q16))
        ()
      }.start()
    try {
      source.addData(docs.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q62")
  }

  test("dsir: stream from the LOADED weight table is row-exact vs batch q69's kept set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val batchKeep = graft.operators.Dsir.dsirSelect(d)
      .filter(col("keep") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy { case (id, imp) => (-imp, id) }
      .zipWithIndex.map { case ((id, imp), i) => (i + 1L, id, imp) }.toSeq
    val index = StreamOps.dsirIndex(d)
    val dir = tmp("dsir")
    ModelStore.saveDsir(spark, dir, index, version = 3L)
    val loaded = ModelStore.loadDsir(spark, dir)
    assert(loaded == index, "bucket weight table must round-trip exactly")

    val source = MemoryStream[(Long, String)]
    var gen = Seq.empty[(Long, Long, Long)]
    val q = StreamOps.streamDsir(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.DsirPick], _: Long) =>
        val g = b.collect()
        if (g.nonEmpty) gen = g.sortBy(_.rank).map(p => (p.rank, p.doc_id, p.imp_q16)).toSeq
        ()
      }.start()
    try {
      source.addData(d.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(gen == batchKeep, "loaded-artifact stream must equal batch q69's selection")
  }

  test("bigram_lm: stream perplexity from the LOADED model is row-exact vs batch q61") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val batch = graft.operators.TextOps.perplexity(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    val index = StreamOps.bigramLmIndex(d)
    val dir = tmp("bigramlm")
    ModelStore.saveBigramLm(spark, dir, index, version = 5L)
    val loaded = ModelStore.loadBigramLm(spark, dir)
    assert(loaded == index, "bigram nll + smoothing tables must round-trip exactly")

    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[Long, (Long, Long, Option[Long])]()
    val q = StreamOps.streamPerplexity(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PplReport], _: Long) =>
        b.collect().foreach(r => got(r.doc_id) = (r.n_bigrams, r.nll_q16, r.ppl_q16)); ()
      }.start()
    try {
      source.addData(d.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q61")
  }

  test("rag_index: streaming RAG from the LOADED index is row-exact vs batch q102") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Rag
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val batch = Rag.ragSearch(docs, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    val model = Rag.ragModel(docs, embs)
    val dir = tmp("ragindex")
    ModelStore.saveRagIndex(spark, dir, model, version = 1L)
    val loaded = ModelStore.loadRagIndex(spark, dir)
    assert(loaded == model, "probe terms, vectors, and scalars must round-trip exactly")

    val feed: Array[(Long, String, Seq[Float])] = docs
      .select(col("doc_id"), col("text"))
      .join(embs.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
        col("text"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getSeq[Float](2)))
    val source = MemoryStream[(Long, String, Seq[Float])]
    val got = collection.mutable.Map[(Long, Long),
      (Long, Option[Long], Long, Option[Long], Option[Long])]()
    val q = StreamOps.streamRagSearch(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.RagHit], _: Long) =>
        val rows = b.collect()
        rows.map(_.query_id).distinct
          .foreach(qid => got.keys.filter(_._1 == qid).toSeq.foreach(got.remove))
        rows.foreach(h => got((h.query_id, h.rank)) =
          ((h.doc_id, h.passage_id, h.rrf_e6, h.lex_rank, h.sem_rank)))
        ()
      }.start()
    try {
      source.addData(feed.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q102")
  }

  test("kn_lm: stream KN scoring from the LOADED model is row-exact vs batch q104") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.NgramLm
    val d = Tables.documents(spark, sfDir)
    val batch = NgramLm.knPerplexity(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    val dir = tmp("knlm")
    ModelStore.saveKnLm(spark, dir, NgramLm.knModelFrames(d), version = 1L)
    val loaded = ModelStore.loadKnLm(spark, dir)
    assert(loaded.tri.nonEmpty && loaded.uni.nonEmpty,
      "ARPA tables must round-trip non-empty")

    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[Long, (Long, Long, Option[Long])]()
    val q = StreamOps.streamKnPerplexity(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.KnScoreDoc], _: Long) =>
        b.collect().foreach(r => got(r.doc_id) = (r.n_trigrams, r.nll_q16, r.ppl_q16)); ()
      }.start()
    try {
      source.addData(d.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q104")
  }

  test("kn_lm order-n: s58N from the LOADED order-5 artifact is row-exact vs batch q104b; pruned artifact replays q104c") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.NgramLm
    val d = Tables.documents(spark, sfDir)
    def scores(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    def streamScores(model: NgramLm.KnLmModelN) = {
      val source = MemoryStream[(Long, String)]
      val got = collection.mutable.Map[Long, (Long, Long, Option[Long])]()
      val q = StreamOps.streamKnPerplexityN(source.toDS(), model)
        .writeStream.outputMode(OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.KnScoreDocN], _: Long) =>
          b.collect().foreach(r => got(r.doc_id) = (r.n_ngrams, r.nll_q16, r.ppl_q16)); ()
        }.start()
      try {
        source.addData(d.select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      got.toMap
    }
    // UNPRUNED order 5: training corpus always hits the top table
    val dir5 = tmp("knlm5")
    ModelStore.saveKnLmN(spark, dir5, NgramLm.knModelFramesN(d, 5), version = 1L,
      order = 5, minCount = 1L, minCtx = 1L)
    val m5 = ModelStore.loadKnLmN(spark, dir5)
    assert(ModelStore.manifest(spark, dir5).params("order") == "5")
    assert(streamScores(m5) == scores(NgramLm.knPerplexityN(d, 5)),
      "loaded order-5 artifact stream must equal batch q104b")
    // PRUNED order 3: pruned-away entries walk the generic ladder and
    // must still replay batch q104c bit-for-bit from the artifact
    val dir3 = tmp("knlm3p")
    ModelStore.saveKnLmN(spark, dir3,
      NgramLm.knModelFramesN(d, 3, minCount = 2L, minCtx = 2L), version = 1L,
      order = 3, minCount = 2L, minCtx = 2L)
    val m3 = ModelStore.loadKnLmN(spark, dir3)
    assert(ModelStore.manifest(spark, dir3).params("min_count") == "2")
    assert(streamScores(m3) == scores(NgramLm.knPerplexityNPruned(d, 3, 2L, 2L)),
      "loaded PRUNED artifact stream must equal batch q104c")
    // the bound bites: the pruned top table is strictly smaller
    val m3full = {
      val dirF = tmp("knlm3f")
      ModelStore.saveKnLmN(spark, dirF, NgramLm.knModelFramesN(d, 3), version = 1L,
        order = 3, minCount = 1L, minCtx = 1L)
      ModelStore.loadKnLmN(spark, dirF)
    }
    assert(m3.levels.last.size < m3full.levels.last.size,
      "minCount=2 must shrink the deployed top table")
  }

  test("nb: stream classification from the LOADED model is row-exact vs batch q72") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val batch = graft.operators.Classifier.nbClassify(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val model = graft.operators.Classifier.nbModel(d)
    val dir = tmp("nb")
    ModelStore.saveNbModel(spark, dir, model, version = 6L)
    val loaded = ModelStore.loadNbModel(spark, dir)
    assert(loaded == model, "bucket weights + prior must round-trip exactly")

    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    val q = StreamOps.streamNbClassify(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.NbScore], _: Long) =>
        b.collect().foreach(r =>
          got(r.doc_id) = (r.is_train, r.n_feats, r.score_q16, r.pred)); ()
      }.start()
    try {
      source.addData(d.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q72")
  }

  test("ccnet_cuts + bigram_lm: the two-artifact s36 deployment is row-exact vs batch q74") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val batch = graft.operators.TextOps.ccnetBuckets(d, k = 256).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.getString(3))))).toMap
    val lmDir = tmp("ccnet_lm"); val cutDir = tmp("ccnet_cuts")
    ModelStore.saveBigramLm(spark, lmDir, StreamOps.bigramLmIndex(d), version = 7L)
    val cuts = graft.operators.TextOps.ccnetCutoffs(d, k = 256)
    ModelStore.saveCcnetCuts(spark, cutDir, cuts, version = 7L)
    val loadedLm = ModelStore.loadBigramLm(spark, lmDir)
    val loadedCuts = ModelStore.loadCcnetCuts(spark, cutDir)
    assert(loadedCuts == cuts, "per-language cutoffs must round-trip exactly")

    val source = MemoryStream[(Long, String, String)]
    val got = collection.mutable.Map[Long, (String, Option[Long], Option[String])]()
    val q = StreamOps.streamCcnetBuckets(source.toDS(), loadedLm, loadedCuts)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.BucketReport], _: Long) =>
        b.collect().foreach(r => got(r.doc_id) = (r.lang, r.ppl_q16, r.bucket)); ()
      }.start()
    try {
      source.addData(d.select(col("doc_id"), col("lang"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "two loaded artifacts must reproduce batch q74")
  }

  test("hybrid: stream from the LOADED model is row-exact vs batch q99") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Hybrid
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val batch = Hybrid.hybridRrf(docs, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    val model = Hybrid.hybridIndex(docs, embs)
    val dir = tmp("hybrid")
    ModelStore.saveHybrid(spark, dir, model, version = 8L)
    val loaded = ModelStore.loadHybrid(spark, dir)
    assert(loaded == model, "probe terms + vectors + scalars must round-trip exactly")

    val feed = docs.select(col("doc_id"), col("text"))
      .join(embs.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
        col("text"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getSeq[Float](2)))
    val source = MemoryStream[(Long, String, Seq[Float])]
    val got = collection.mutable.Map[(Long, Long), (Long, Long, Option[Long], Option[Long])]()
    val q = StreamOps.streamHybridRrf(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.HybridHit], _: Long) =>
        val rows = b.collect()
        rows.map(_.query_id).distinct.foreach(qid =>
          got.keys.filter(_._1 == qid).toSeq.foreach(got.remove))
        rows.foreach(h =>
          got((h.query_id, h.rank)) = (h.doc_id, h.rrf_e6, h.lex_rank, h.sem_rank))
        ()
      }.start()
    try {
      source.addData(feed.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch, "loaded-artifact stream must equal batch q99")
  }

  test("curate_config: the WHOLE s21 chain deploys from one LOADED bundle, row-exact vs batch q53") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Pipeline, TextOps}
    val target = Map("en" -> 2000, "es" -> 2000, "de" -> 2000,
      "fr" -> 2000, "zh" -> 2000)
    // the s21 spec's planted corpus shape: lowercase single-spaced
    // texts so the chain's normalize/segment stages are identities
    val uniq = (i: Int) => (0 until 24).map(j => s"w${i}_$j").mkString(" ")
    val corpusRows = Seq(
      StreamOps.CurDoc(1L, "en", uniq(1)),
      StreamOps.CurDoc(2L, "en", uniq(1)),   // exact dup: drops
      StreamOps.CurDoc(3L, "en", uniq(900)), // benchmark copy: drops
      StreamOps.CurDoc(4L, "en", uniq(4)),
      StreamOps.CurDoc(5L, "es", uniq(5)),
      StreamOps.CurDoc(6L, "de", uniq(6)),
      StreamOps.CurDoc(7L, "fr", uniq(7)),
      StreamOps.CurDoc(8L, "zh", uniq(8)))
    val corpusDF = corpusRows.map(d => (d.doc_id, d.lang, d.text))
      .toDF("doc_id", "lang", "text")
    val benchDF = Seq((9001L, uniq(900)), (9002L, uniq(901))).toDF("doc_id", "text")
    type Span = (Long, Long, Long, Long, Long)
    val batchSpans: Set[Span] = Pipeline.curate(corpusDF, benchDF, target,
      capacity = 64, ruleGate = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(batchSpans.nonEmpty)

    // solve the config offline exactly as the batch chain derives it
    val cleanedDF = corpusDF.filter(col("doc_id") =!= 2L)
    val (lenCut, alphaCut) = Pipeline.qualityCutoffs(cleanedDF, pct = 5)
    val deconDF = corpusDF.filter(col("doc_id").isin(1L, 4L, 5L, 6L, 7L, 8L))
    val cfg = StreamOps.CurateConfig(
      benchShingles = StreamOps.curateBenchShingles(benchDF, shingleN = 4),
      vocab = TextOps.tokenizerVocabSeq(deconDF, m = 64, maxN = 4),
      ratesMyriad = TextOps.tokenMixtureRates(deconDF, target,
        TextOps.tokenizerVocabSeq(deconDF, m = 64, maxN = 4)),
      dupShingles = Set.empty, lenCut = lenCut, alphaCut = alphaCut,
      memCutMyriad = -1, ruleGate = false,
      segWords = 8, shingleN = 4, maxN = 4, capacity = 64, shards = 8,
      subK = 6)

    val dir = tmp("curate_config")
    ModelStore.saveCurateConfig(spark, dir, cfg, version = 11L)
    val loaded = ModelStore.loadCurateConfig(spark, dir)
    assert(loaded == cfg,
      "the whole bundle — shingle sets, ORDERED vocab, rates, Double cutoffs, knobs — must round-trip exactly")

    val source = MemoryStream[StreamOps.CurDoc]
    val acc = collection.mutable.Set.empty[Span]
    val q = StreamOps.streamCurate(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PackedSpan], _: Long) =>
        b.collect().foreach(s => acc.synchronized {
          acc += ((s.shard, s.chunk, s.doc_id, s.tok_start, s.n_toks)) }); ()
      }.start()
    try { source.addData(corpusRows: _*); q.processAllAvailable() }
    finally q.stop()
    assert(acc.toSet == batchSpans,
      "the chain fed from ONE loaded artifact must reproduce batch q53")
  }

  test("unigram: the s56 encoder from the LOADED artifact is row-exact vs batch q101b") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Unigram
    val docs = Tables.documents(spark, sfDir)
    val batch = Unigram.unigramEncode(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val model = Unigram.unigramFit(docs)
    val dir = tmp("unigram")
    ModelStore.saveUnigram(spark, dir, model, maxLen = 4, version = 3L)
    val (loaded, maxLen) = ModelStore.loadUnigram(spark, dir)
    assert(loaded.pieces.toSet == model.pieces.toSet && maxLen == 4,
      "pieces + grid must round-trip exactly (order is not part of the model)")

    val feed = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val source = MemoryStream[(Long, String)]
    val got = collection.mutable.Map[Long, (Long, String)]()
    val q = StreamOps.streamUnigramEncode(source.toDS(), loaded, maxLen)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.UnigramSegDoc], _: Long) =>
        b.collect().foreach(d => got(d.doc_id) = ((d.n_pieces, d.subtext))); ()
      }.start()
    try { source.addData(feed.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    assert(got.toMap == batch, "loaded-artifact encoder must equal batch q101b")
  }

  test("drift_expected: the s55 monitor from the LOADED baseline is row-exact vs batch q100") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Drift
    val docs = Tables.documents(spark, sfDir)
    val v1 = docs.filter(col("doc_id") % 3 =!= 0)
    val v2 = docs.filter(col("doc_id") % 2 =!= 0)
    val batch = Drift.driftPsi(v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val expected = Drift.expectedCounts(v1)
    val dir = tmp("drift")
    ModelStore.saveDriftExpected(spark, dir, expected, lenDiv = 256L,
      lenCap = 15L, version = 12L)
    val loaded = ModelStore.loadDriftExpected(spark, dir)
    assert(loaded == Drift.DriftBaseline(expected, 256L, 15L),
      "baseline counts + length grid must round-trip exactly as one typed bundle")

    val feed = v2.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect().map(r => StreamOps.DriftDoc(r.getLong(0), r.getString(1),
        r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val source = MemoryStream[StreamOps.DriftDoc]
    val got = collection.mutable.Map[String, Map[(String, String), (Long, Long, Long, Long, Long)]]()
    val q = StreamOps.streamDriftPsi(source.toDS(), loaded)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.DriftRow], _: Long) =>
        b.collect().groupBy(_.feature).foreach { case (f, rs) =>
          got(f) = rs.map(r => (r.feature, r.bucket) ->
            ((r.n1, r.n2, r.p_e8, r.q_e8, r.psi_contrib))).toMap
        }
        ()
      }.start()
    try { source.addData(feed.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    assert(got.values.flatten.toMap == batch,
      "loaded-baseline monitor must equal batch q100")
  }
}
