package graft.tools
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    time("warmup")(emb.count())
    time("q28 knn")(graft.operators.Similarity.knnBruteForce(emb).count())
    time("q28 again")(graft.operators.Similarity.knnBruteForce(emb).count())
    time("q29 lsh")(graft.operators.Similarity.knnLsh(emb).count())
    spark.stop()
  }
}
