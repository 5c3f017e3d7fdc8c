package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** r15 one-off: attribute the q53 pin drift (15.3 s r14 pin vs 11.8 s
  * r13 contended reading) — rule stage on vs off in the SAME window,
  * min-of-3 each, interleaved A/B/A/B so ambient drift hits both arms.
  */
object Q53AB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def steal(): Long = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu ")).get.trim.split("\\s+")(8).toLong
      finally src.close()
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val tgt = Map("en" -> 2000, "es" -> 2000, "de" -> 2000, "fr" -> 2000, "zh" -> 2000)
    def run(rule: Boolean): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val s0 = steal(); val t0 = System.nanoTime()
      graft.Bench.force(graft.operators.Pipeline.curate(
        corpus, bench, tgt, materializeStages = true, ruleGate = rule))
      val w = (System.nanoTime() - t0) / 1e9
      val st = (steal() - s0) / 100.0 / w
      println(f"[q53ab] ruleGate=$rule wall=$w%.3f steal_cpus=$st%.4f")
      w
    }
    run(true); run(false) // warmup both arms
    val on = collection.mutable.ArrayBuffer[Double]()
    val off = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 3) { on += run(true); off += run(false) }
    println(f"[q53ab] RESULT on_min=${on.min}%.3f off_min=${off.min}%.3f delta=${on.min - off.min}%.3f")
    spark.stop()
  }
}
