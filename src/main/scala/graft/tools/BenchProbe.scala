package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-pass timing probe for individual bench queries, in an isolated
  * JVM with the exact Bench session config. Usage:
  *
  *   runMain graft.tools.BenchProbe <sfDir> <passes> [warm] q19_inactive_customers ...
  *
  * `warm` replays Bench's warmup family list first, so a query can be
  * timed in the same codegen/JIT context the bench measures it in.
  * Prints one line per pass — the shape of the sequence (flat vs
  * decaying) distinguishes plan cost from cold-JIT noise.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(5)
    val warm = args.contains("warm")
    val names = args.drop(2).filterNot(_ == "warm")
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
    if (warm) {
      for (w <- Seq("q11_pricing_summary", "q12_top_unshipped",
          "q14_window_running", "q28b_knn_blocked", "q25_dedup_minhash",
          "q31_multimodal_meta", "q42b_dedup_groups_lsh"))
        SparkEntry.queries.get(w)
          .foreach(fn => try graft.Bench.force(fn(spark, sfDir)) catch { case _: Throwable => () })
      println("[probe] warmup done")
    }
    // per-pass process-CPU beside wall: the wait-vs-work discriminator
    // (Bench.scala rationale) — an A/B that moves wall but not CPU is
    // host contention, one that moves both is a real plan change
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuNanos: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { i =>
        val t0 = System.nanoTime()
        val c0 = cpuNanos
        graft.Bench.force(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = if (c0 < 0) -1.0 else (cpuNanos - c0) / 1e9
        println(f"[probe] $name pass $i: $dt%.3f s cpu=$dc%.3f s load=${osBean.getSystemLoadAverage}%.2f")
        (dt, dc)
      }
      println(f"[probe] $name min=${times.map(_._1).min}%.3f median=${times.map(_._1).sorted.apply(times.size / 2)}%.3f cpuMin=${times.map(_._2).min}%.3f")
    }
    spark.stop()
  }
}
