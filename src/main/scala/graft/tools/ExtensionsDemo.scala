package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end proof of the cluster-style extension load path: a fresh
  * session built with spark.sql.extensions=graft.GraftExtensions must
  * expose the native functions to pure SQL with no programmatic
  * registration.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql(
      """SELECT count(*) AS n,
                count(DISTINCT rhp_signature(embedding, 8)) AS buckets,
                hll_estimate(hll_sketch(vec_id)) AS distinct_est,
                CAST(sum(dot_d(embedding, embedding)) AS LONG) AS sum_n2
         FROM emb""").show()
    spark.stop()
  }
}
