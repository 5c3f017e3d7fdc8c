package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    time("q27 ngram")(graft.operators.Dedup.ngramJaccard(docs).count())
    time("q25 minhash")(graft.operators.Dedup.dedupMinHash(docs).count())
    time("q26 simhash")(graft.operators.Dedup.dedupSimHash(docs).count())
    spark.stop()
  }
}
