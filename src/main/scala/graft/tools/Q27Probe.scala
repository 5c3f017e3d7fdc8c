package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of q27 (exact n-gram Jaccard best-match,
  * Dedup.ngramJaccard) — names where the ~10 s at sf0.1 actually goes
  * so the constant-cutting work targets the dominant stage instead of
  * guessing. Mirrors the operator's stages with the same helpers;
  * timings are per-stage deltas with everything upstream checkpointed,
  * so each number is that stage's own cost.
  *
  *   runMain graft.tools.Q27Probe [sfDir] [passes]
  */
object Q27Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q27probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val shingleN = 7
    val maxDf = 256
    for (p <- 1 to passes) {
      println(s"[q27probe] === pass $p ===")
      val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      val shSets = time("1 shSets (shingle kernel + checkpoint)") {
        documents
          .select(col("doc_id"),
            regexp_replace(lower(graft.operators.TextOps.wsTrim(col("text"))), "\\s+", " ").as("norm"))
          .select(col("doc_id"), graft.functions.VectorFunctions
            .char_shingle_set(col("norm"), shingleN).as("shs"))
          .localCheckpoint(true)
      }
      val post = shSets.select(col("doc_id"), explode(col("shs")).as("shingle"))
      val dfc = post.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val blackArr = time("2 df + blacklist collect") {
        dfc.filter(col("df") > maxDf).select(col("shingle"))
          .limit(65537).collect().map(_.getLong(0))
      }
      val pruned = time("3 pruned postings (broadcast anti-join) checkpoint") {
        val bl = blackArr.toSeq.toDF("shingle")
        post.join(broadcast(bl), Seq("shingle"), "left_anti")
          .select(col("doc_id"), col("shingle"))
          .localCheckpoint(true)
      }
      println(s"[q27probe]   postings rows: ${pruned.count()}")
      val common = time("4 common pair join+agg (forced)") {
        val c = pruned.as("pa").join(pruned.as("pb"),
            col("pa.shingle") === col("pb.shingle") &&
            col("pa.doc_id") < col("pb.doc_id"))
          .groupBy(col("pa.doc_id").as("id_a"), col("pb.doc_id").as("id_b"))
          .agg(count(lit(1)).as("n_common"))
          .localCheckpoint(true)
        println(s"[q27probe]   pair rows: ${c.count()}")
        c
      }
      time("5 scored+best+completion (forced)") {
        val sizes = pruned.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val scored = common
          .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          .withColumn("jaccard",
            col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        val dirs = scored.select(col("id_a").as("doc_id"), col("id_b").as("partner"),
            col("n_common"), col("jaccard"))
          .unionAll(scored.select(col("id_b").as("doc_id"), col("id_a").as("partner"),
            col("n_common"), col("jaccard")))
        val best = dirs.groupBy(col("doc_id"))
          .agg(max_by(
            struct(col("partner"), col("n_common"), col("jaccard")),
            struct(col("jaccard"), (-col("partner")).as("tb"))).as("b"))
          .select(col("doc_id"), col("b.partner").as("best_neighbor"),
            col("b.n_common").as("best_common"), col("b.jaccard").as("best_jaccard"))
        val out = documents.select(col("doc_id")).join(sizes, Seq("doc_id"), "left")
          .join(best, Seq("doc_id"), "left")
        graft.Bench.force(out)
      }
      time("6 FULL q27 (operator, forced)") {
        graft.Bench.force(graft.operators.Dedup.ngramJaccard(documents))
      }
    }
    spark.stop()
  }
}
