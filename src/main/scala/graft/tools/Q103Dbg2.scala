package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q103Dbg2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/q103dbg2")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, d)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val rest = docs.filter(col("doc_id") % 97 =!= 0)
    val st = graft.operators.Pipeline.curateState(
      rest.filter(col("doc_id") % 7 =!= 0), bench,
      Map("en" -> 2000, "es" -> 2000, "de" -> 2000, "fr" -> 2000, "zh" -> 2000),
      materializeStages = true)
    st.corpusShingles.write.mode("overwrite").parquet(s"$out/v1_shingles")
    st.canonDigests.write.mode("overwrite").parquet(s"$out/v1_canon")
    st.segDigests.write.mode("overwrite").parquet(s"$out/v1_segs")
    st.winDigests.write.mode("overwrite").parquet(s"$out/v1_wins")
    println("[dbg2] shingles=" + st.corpusShingles.count() +
      " canon=" + st.canonDigests.count() + " segs=" + st.segDigests.count() +
      " wins=" + st.winDigests.count())
    spark.stop()
  }
}
