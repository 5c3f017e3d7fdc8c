package graft.tools

import org.apache.spark.sql.SparkSession

/** Compact physical-plan audit over every SparkEntry query: shuffle
  * count, join strategies, codegen coverage, and scan pushdown — the
  * per-operator checklist from SURVEY.md §5 in one report.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        def n(p: String) = p.r.findAllIn(plan).size
        println(f"$name%-26s shuffles=${n("Exchange hashpartitioning")}%2d " +
          f"bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d " +
          f"bnlj=${n("BroadcastNestedLoopJoin")}%2d cartesian=${n("CartesianProduct")}%2d " +
          f"sorts=${n("\\+- Sort ")}%2d codegen=${n("\\*\\(")}%2d fallback=${n("CodegenFallback")}%d")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
