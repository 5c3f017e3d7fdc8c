package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: print scan count + distinct ReadSchema lines of named
  * queries' executed plans — the 5-second pushdown/pruning eyeball
  * (PlanAuditSpec asserts the load-bearing shapes; this is for
  * inspecting a NEW query before writing its audit).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val s = df.queryExecution.executedPlan.toString
      println("scans: " + "Scan parquet".r.findAllIn(s).size)
      "ReadSchema: [^\n]*".r.findAllIn(s).toSet.foreach((x: String) => println("  " + x.take(150)))
    }
    spark.stop()
  }
}
