package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q105: URL/DOMAIN filtering — RefinedWeb's FIRST curation stage
  * (Penedo et al. 2023, arXiv:2306.01116 §3.1: an origin-domain
  * blocklist plus a word-based URL score), run before any content is
  * even fetched in a production crawl pipeline — the cheapest possible
  * drop decision (metadata only, the text column is never read).
  *
  * Rules, each an attributable boolean (the q70 contract):
  *   - rule_domain: the url's host is not on the domain BLOCKLIST
  *     (RefinedWeb curates ~4.6M blocked domains; the list is config —
  *     here a literal set, the engine-side mechanics identical);
  *   - rule_score: the weighted flag-word score of the full url stays
  *     below `cutMyriad` (the paper's soft signal: adult/fraud terms
  *     in the path are strong junk predictors even off the blocklist);
  *   - pass = conjunction.
  *
  * Host extraction is one RE2∩Java-identical regexp_extract
  * ('^https?://([^/]+)' — no lookaround), so the DuckDB oracle replays
  * byte-for-byte; the score is an integer myriad sum of CASE/contains
  * terms (no float). A stateless narrow projection: zero exchanges,
  * scan prunes to (doc_id, url) — the q70/q77 plan family, and the
  * reason url filtering runs FIRST at 100 TB.
  *
  * The driver's documents table carries no url column, so the
  * REGISTERED entry PLANTS urls deterministically from doc_id with the
  * IDENTICAL expression in both engines (the q58 planted-PII
  * discipline): domain from a 12-entry literal list by doc_id%12 (two
  * entries blocklisted), path word from a 7-entry list by doc_id%7
  * (two flag words) — every rule fires both ways on real rows.
  */
object UrlFilter {

  /** The registered blocklist + flag-word weights (config in a real
    * deployment; literals here so the oracle states them too).
    */
  val Blocklist: Seq[String] = Seq("badsite.example", "spamfarm.example")
  val FlagWords: Seq[(String, Long)] =
    Seq(("casino", 5000L), ("xxx", 10000L), ("freebie", 2500L))
  val DefaultCutMyriad: Long = 5000L

  val PlantDomains: Seq[String] = Seq(
    "news.example", "badsite.example", "blog.example", "docs.example",
    "forum.example", "spamfarm.example", "wiki.example", "shop.example",
    "mail.example", "code.example", "video.example", "edu.example")
  val PlantWords: Seq[String] =
    Seq("article", "casino", "research", "xxx", "recipe", "freebie", "travel")

  private val HostRe = "^https?://([^/]+)"

  /** Deterministic url from doc_id — the planting expression the
    * registered entry and the oracle share.
    */
  def plantedUrl(docId: Column): Column =
    concat(lit("https://"),
      element_at(typedLit(PlantDomains), (docId % 12).cast("int") + 1),
      lit("/"),
      element_at(typedLit(PlantWords), (docId % 7).cast("int") + 1),
      lit("/"), docId.cast("string"))

  /** The operator proper: expects (doc_id, url); emits per-rule
    * booleans (BIGINT 0/1, the q70 convention), the extracted domain,
    * the integer score, and the conjunctive pass. Null/unparseable
    * urls extract an empty domain, score 0, and FAIL rule_domain (a
    * row with no attributable origin must not pass an origin filter —
    * pinned by spec).
    */
  def urlRules(docs: DataFrame, cutMyriad: Long = DefaultCutMyriad): DataFrame = {
    val domain = regexp_extract(col("url"), HostRe, 1)
    val score = FlagWords.map { case (w, wt) =>
      when(col("url").isNotNull && col("url").contains(w), lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(
        col("doc_id"), col("url"), domain.as("domain"), score.as("score_myriad"))
      .select(col("doc_id"), col("url"), col("domain"), col("score_myriad"),
        when(length(col("domain")) > 0 &&
          !col("domain").isin(Blocklist: _*), lit(1L)).otherwise(lit(0L))
          .as("rule_domain"),
        when(col("score_myriad") < lit(cutMyriad), lit(1L)).otherwise(lit(0L))
          .as("rule_score"))
      .withColumn("pass",
        when(col("rule_domain") === 1L && col("rule_score") === 1L, lit(1L))
          .otherwise(lit(0L)))
  }

  /** q105 registered entry: urls planted from doc_id, then the rules. */
  def urlFilterPlanted(documents: DataFrame,
                       cutMyriad: Long = DefaultCutMyriad): DataFrame =
    urlRules(documents.select(col("doc_id"),
      plantedUrl(col("doc_id")).as("url")), cutMyriad)

  /** The planted-url PASS set as one oracle CTE — the q53c chain's
    * stage −1 (emitted before chainCtes so the corpus predicate can
    * reference it); the identical plant/extract/score logic as
    * [[urlFilterOracleSql]], reduced to the passing doc_ids.
    */
  def passCteSql(cteName: String, cutMyriad: Long = DefaultCutMyriad): String = {
    val domains = PlantDomains.map(d => s"'$d'").mkString(", ")
    val words = PlantWords.map(w => s"'$w'").mkString(", ")
    val blocked = Blocklist.map(d => s"'$d'").mkString(", ")
    val scoreSql = FlagWords.map { case (w, wt) =>
      s"CASE WHEN contains(url, '$w') THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""$cteName AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |           regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
       |           CAST($scoreSql AS BIGINT) AS score_myriad
       |    FROM (SELECT doc_id,
       |                 'https://' || ([$domains])[CAST(doc_id % 12 AS INT) + 1]
       |                   || '/' || ([$words])[CAST(doc_id % 7 AS INT) + 1]
       |                   || '/' || CAST(doc_id AS VARCHAR) AS url
       |          FROM documents) u) r
       |  WHERE length(domain) > 0 AND domain NOT IN ($blocked)
       |    AND score_myriad < $cutMyriad)""".stripMargin
  }

  /** The q105 oracle: the identical planting + extraction + integer
    * score in DuckDB.
    */
  def urlFilterOracleSql(cutMyriad: Long = DefaultCutMyriad): String = {
    val domains = PlantDomains.map(d => s"'$d'").mkString(", ")
    val words = PlantWords.map(w => s"'$w'").mkString(", ")
    val blocked = Blocklist.map(d => s"'$d'").mkString(", ")
    val scoreSql = FlagWords.map { case (w, wt) =>
      s"CASE WHEN contains(url, '$w') THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""WITH u AS (
       |  SELECT doc_id,
       |         'https://' || ([$domains])[CAST(doc_id % 12 AS INT) + 1]
       |           || '/' || ([$words])[CAST(doc_id % 7 AS INT) + 1]
       |           || '/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, url,
       |         regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
       |         CAST($scoreSql AS BIGINT) AS score_myriad
       |  FROM u)
       |SELECT doc_id, url, domain, score_myriad,
       |       CAST(CASE WHEN length(domain) > 0
       |                  AND domain NOT IN ($blocked) THEN 1 ELSE 0 END AS BIGINT)
       |         AS rule_domain,
       |       CAST(CASE WHEN score_myriad < $cutMyriad THEN 1 ELSE 0 END AS BIGINT)
       |         AS rule_score,
       |       CAST(CASE WHEN length(domain) > 0 AND domain NOT IN ($blocked)
       |                  AND score_myriad < $cutMyriad THEN 1 ELSE 0 END AS BIGINT)
       |         AS pass
       |FROM r""".stripMargin
  }
}
