package graft.tools

import org.apache.spark.sql.SparkSession

/** q101 cost-axis probe (the BPE_MERGES.json methodology, r13 verdict
  * task #2's "done" criterion): wall seconds of unigramFit along the
  * two axes a production sizing moves — seed-vocab breadth (seedCap)
  * and EM depth (emIters) — at fixed wordCap. The expected shape, and
  * what the artifact verifies: the corpus pass (one word-frequency
  * aggregate) dominates and is CONSTANT across both axes; each EM
  * iteration adds one bounded segmentation job over the wordCap-row
  * frame (a scheduler-floor constant, not a corpus cost), so the
  * emIters axis is linear with a small slope and the seedCap axis is
  * nearly flat (driver-side DP over ≤4-cp pieces).
  *
  *   runMain graft.tools.UnigramAxisProbe [sfDir] [passes]
  * Redirect the JSON line to tools/UNIGRAM_AXIS.json.
  */
object UnigramAxisProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timeMin(f: => Unit): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    // the corpus pass alone (the constant every cell shares)
    val corpusPass = timeMin {
      docs.selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS w")
        .where("length(w) > 0").groupBy("w").count().count(); ()
    }
    val seedAxis = Seq(48, 192, 768).map(c =>
      c -> timeMin { graft.operators.Unigram
        .unigramFit(docs, wordCap = 2048, seedCap = c, emIters = 2); () })
    val emAxis = Seq(1, 2, 4, 8).map(e =>
      e -> timeMin { graft.operators.Unigram
        .unigramFit(docs, wordCap = 2048, seedCap = 192, emIters = e); () })
    val perIter =
      (emAxis.last._2 - emAxis.head._2) / (emAxis.last._1 - emAxis.head._1).toDouble
    val j = new StringBuilder
    j ++= "{\"probe\":\"q101_axes\",\"sf_dir\":\"" + sfDir + "\",\"word_cap\":2048"
    j ++= f""","corpus_pass_sec":$corpusPass%.3f"""
    j ++= ",\"seed_cap\":{" + seedAxis.map { case (c, s) =>
      "\"" + c + "\":" + f"$s%.3f" }.mkString(",") + "}"
    j ++= ",\"em_iters\":{" + emAxis.map { case (e, s) =>
      "\"" + e + "\":" + f"$s%.3f" }.mkString(",") + "}"
    j ++= f""","per_em_iter_sec":$perIter%.4f"""
    j ++= ",\"passes\":" + passes + "}"
    println(j.result())
    spark.stop()
  }
}
