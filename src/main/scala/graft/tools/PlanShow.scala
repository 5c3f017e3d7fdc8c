package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query —
  * the `.explain("formatted")` loop from SURVEY.md §5, runnable
  * per-query: `runMain graft.tools.PlanShow <name> [sfDir]`.
  */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect() // settle AQE so the final plan prints
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
