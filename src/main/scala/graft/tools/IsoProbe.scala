import org.apache.spark.sql.SparkSession

/** Isolated fresh-JVM query probe (the same-window A/B discriminator
  * SURVEY §8 prescribes): `runMain IsoProbe <query>...` runs each
  * registered query twice at sf0.1 under the Bench session config and
  * prints wall seconds — pass1 carries JIT, pass2 approximates the
  * in-bench steady state without any cross-query JVM residue.
  */
object IsoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[iso] $q pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
