package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q105: URL/domain filtering. Value gate = the driver's DuckDB
  * compare; these pin the rule semantics on hand urls, the
  * null/unparseable degradation, planted coverage (every rule fires
  * both ways on the real corpus), and determinism.
  */
class UrlFilterSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.UrlFilter
  import graft.sources.Tables

  lazy val docs = Tables.documents(spark, sfDir)

  test("q105 rules on hand urls: blocklist, score weights, conjunction") {
    import spark.implicits._
    val hand = Seq(
      (1L, "https://news.example/article/1"),          // clean
      (2L, "https://badsite.example/article/2"),       // blocked domain
      (3L, "https://blog.example/casino/3"),           // casino 5000 >= cut
      (4L, "https://blog.example/freebie/4"),          // freebie 2500 < cut
      (5L, "http://spamfarm.example/xxx/5"),           // blocked AND xxx
      (6L, "https://shop.example/casino/freebie-xxx"), // 5000+10000+2500
      (7L, null: String),                              // no url
      (8L, "not a url at all")                         // unparseable
    ).toDF("doc_id", "url")
    val out = UrlFilter.urlRules(hand).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    assert(out(1L) == (("news.example", 0L, 1L, 1L, 1L)))
    assert(out(2L) == (("badsite.example", 0L, 0L, 1L, 0L)))
    assert(out(3L) == (("blog.example", 5000L, 1L, 0L, 0L)))
    assert(out(4L) == (("blog.example", 2500L, 1L, 1L, 1L)))
    assert(out(5L)._1 == "spamfarm.example" && out(5L)._2 == 10000L &&
      out(5L)._5 == 0L)
    assert(out(6L)._2 == 17500L && out(6L)._4 == 0L)
    // null / unparseable: empty domain fails rule_domain (no
    // attributable origin must not pass an origin filter)
    assert(out(7L)._3 == 0L && out(7L)._5 == 0L)
    assert(out(8L)._1 == "" && out(8L)._3 == 0L && out(8L)._5 == 0L)
  }

  test("q105 planted corpus: every rule fires both ways, pass == conjunction") {
    val out = UrlFilter.urlFilterPlanted(docs).localCheckpoint(true)
    for (c <- Seq("rule_domain", "rule_score", "pass")) {
      assert(out.filter(col(c) === 1L).count() > 0, s"$c never passes")
      assert(out.filter(col(c) === 0L).count() > 0, s"$c never fails")
    }
    assert(out.filter(col("pass") =!=
      (col("rule_domain") * col("rule_score"))).count() == 0)
    // the blocklist is exactly the two planted domains
    val blockedDomains = out.filter(col("rule_domain") === 0L)
      .select("domain").distinct().collect().map(_.getString(0)).toSet
    assert(blockedDomains == UrlFilter.Blocklist.toSet)
    // stateless: one row per doc
    assert(out.count() == docs.count())
  }

  test("q105 repartition determinism") {
    assertSameRows(UrlFilter.urlFilterPlanted(docs),
      UrlFilter.urlFilterPlanted(docs.repartition(7)))
  }
}
