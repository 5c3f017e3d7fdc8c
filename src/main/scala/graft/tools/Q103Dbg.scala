package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q103Dbg {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/q103dbg")
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
    println(s"[dbg] lenCut=${st.lenCut} alphaCut=${st.alphaCut}")
    println(s"[dbg] vocab=${st.vocab.mkString("|")}")
    println(s"[dbg] rates=${st.ratesMyriad.toSeq.sortBy(_._1)}")
    val delta = rest.filter(col("doc_id") % 7 === 0)
    val mem = graft.operators.Pipeline.curateDeltaDocs(delta, st)
    mem.select(col("doc_id"), col("lang"), md5(coalesce(col("text"), lit(" "))).as("h"))
      .write.mode("overwrite").parquet(s"$out/mem")
    val adm = graft.operators.TextOps.mixtureAdmitFrozen(mem, st.ratesMyriad, st.vocab, st.maxN)
    adm.select(col("doc_id"), col("n_tokens")).write.mode("overwrite").parquet(s"$out/admitted")
    println("[dbg] mem=" + mem.count() + " admitted=" + adm.count())
    spark.stop()
  }
}
