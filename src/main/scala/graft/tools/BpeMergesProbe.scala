package graft.tools

import org.apache.spark.sql.SparkSession

/** q67 merges-axis probe (round-12 task #2): quantifies the
  * production-merges bound the r11 verdict flagged — the sequential
  * distributed trainer (Bpe.bpeTrain, one argmax collect per merge)
  * pays a full driver round-trip PER MERGE, so its wall time is linear
  * in `merges` with a per-job scheduler floor regardless of cluster
  * size, while the in-memory incremental trainer (Bpe.bpeTrainFast,
  * the registered q67 path since r12, parity-pinned bit-equal in
  * BpeSpec) pays the corpus aggregate once and then runs the merge
  * loop as pure computation over the vocabCap-bounded word table.
  *
  * Prints one JSON line with per-merges-depth wall seconds for both
  * trainers plus the fitted per-merge marginal cost of the sequential
  * loop; redirect to tools/BPE_MERGES.json for the artifact.
  *
  *   runMain graft.tools.BpeMergesProbe [sfDir] [passes]
  */
object BpeMergesProbe {
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
    def timeMin(f: => Long): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // sequential loop at shallow depths only (its cost is the point);
    // the fast trainer also at production-flavored depth
    val seqDepths = Seq(24, 48, 96)
    val fastDepths = Seq(24, 48, 96, 384, 1536)
    val seq = seqDepths.map(m =>
      m -> timeMin(graft.operators.Bpe.bpeTrain(docs, vocabCap = 2048, merges = m).count()))
    val fast = fastDepths.map(m =>
      m -> timeMin(graft.operators.Bpe.bpeTrainFast(docs, vocabCap = 2048, merges = m).count()))
    // marginal driver cost per sequential merge from the two largest
    // depths; extrapolated to the 30k merges a production tokenizer runs
    val perMerge =
      (seq.last._2 - seq.head._2) / (seqDepths.last - seqDepths.head).toDouble
    val extrap30k = perMerge * 30000
    val j = new StringBuilder
    j ++= "{\"probe\":\"q67_merges\",\"sf_dir\":\"" + sfDir + "\",\"vocab_cap\":2048"
    j ++= ",\"sequential\":{" + seq.map { case (m, s) =>
      "\"" + m + "\":" + f"$s%.3f" }.mkString(",") + "}"
    j ++= ",\"fast\":{" + fast.map { case (m, s) =>
      "\"" + m + "\":" + f"$s%.3f" }.mkString(",") + "}"
    j ++= f",\"seq_per_merge_sec\":$perMerge%.4f"
    j ++= f",\"seq_extrapolated_30k_merges_sec\":$extrap30k%.1f"
    j ++= ",\"passes\":" + passes + "}"
    println(j.result())
    spark.stop()
  }
}
