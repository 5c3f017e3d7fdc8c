package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: graft's native expressions must be usable
  * from pure SQL once registered (extension class on a cluster, or
  * programmatic register()).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dot_d and rhp_signature are callable from SQL") {
    GraftExtensions.register(spark)
    graft.sources.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val row = spark.sql(
      """SELECT dot_d(embedding, embedding) AS n2,
                rhp_signature(embedding, 16) AS bucket,
                rhp_signature(embedding, 16, 16) AS bucket2,
                qrhp_signature(embedding, 16) AS qbucket
         FROM emb LIMIT 1""").head()
    assert(row.getDouble(0) > 0.0)
    assert(row.getLong(1) >= 0L && row.getLong(1) < (1L << 16))
    // offset selects DIFFERENT hyperplanes: same width, different bucket
    assert(row.getLong(2) >= 0L && row.getLong(2) < (1L << 16))
    assert(row.getLong(3) >= 0L && row.getLong(3) < (1L << 16))
  }

  test("SQL dot_d matches the Scala DSL dot product exactly") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    emb.createOrReplaceTempView("emb2")
    val sql = spark.sql("SELECT vec_id, dot_d(embedding, embedding) AS n2 FROM emb2")
    val dsl = emb.select(emb("vec_id"),
      graft.operators.Similarity.norm2(emb("embedding")).as("n2"))
    assertSameRows(sql, dsl)
  }

  test("extension class applies cleanly to a new session") {
    // same JVM: active session already exists, so exercise the
    // SparkSessionExtensions wiring directly against a fresh Extensions
    // instance (what spark.sql.extensions does at session build).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builder-level smoke: definitions registered without throwing
    assert(GraftExtensions.definitions.map(_._1).toSet ==
      Set("dot_d", "rhp_signature", "qrhp_signature", "hll_sketch", "hll_estimate",
        "poly_hash", "rhp_multi_signature", "simhash_lanes", "char_shingle_set",
        "top_k_lex", "quantile_sketch", "token_stats"))
  }

  test("token_stats is callable from SQL with a literal vocab and agrees with the DSL") {
    GraftExtensions.register(spark)
    graft.sources.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_sql")
    val row = spark.sql(
      "SELECT token_stats('aaab', array('aaa', 'ab')) AS ts").head().getStruct(0)
    assert((row.getLong(0), row.getLong(1)) == ((2L, 1L))) // greedy: aaa + fallback b
    // non-literal vocab is rejected loudly (it must fold into the plan)
    val ex = intercept[Exception] {
      spark.sql("SELECT token_stats(text, array(text)) FROM docs_sql LIMIT 1").head()
    }
    assert(ex.getMessage.contains("foldable"), ex.getMessage)
  }

  test("round-4 kernels are callable from SQL and agree with the DSL") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    graft.sources.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_sql")
    val row = spark.sql(
      """SELECT poly_hash(text) AS ph,
                size(char_shingle_set(text, 7)) AS nsh,
                simhash_lanes(poly_hash(text)) AS lanes
         FROM docs_sql WHERE length(text) > 20 LIMIT 1""").head()
    assert(row.getLong(0) >= 0L && row.getLong(0) < 1000000007L)
    assert(row.getInt(1) > 0)
    assert(row.getSeq[Long](2).length == graft.functions.SimHashLanes.NLanes)
    // multi-signature from SQL == per-table DSL signatures
    graft.sources.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql")
    val multi = spark.sql(
      "SELECT vec_id, rhp_multi_signature(embedding, 8, 4) AS s FROM emb_sql")
    val dsl = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.functions.VectorFunctions
        .rhp_multi_signature(col("embedding"), 8, 4).as("s"))
    assertSameRows(
      multi.selectExpr("vec_id", "cast(s as string) AS s"),
      dsl.selectExpr("vec_id", "cast(s as string) AS s"))
  }
}
