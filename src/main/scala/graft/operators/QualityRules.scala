package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q70: GOPHER-STYLE RULE FILTERING (Rae et al., "Scaling Language
  * Models: ... Gopher", 2021, arXiv:2112.11446 Appendix A) — the
  * rule battery every web-scale curation pipeline runs before any
  * model-based scoring: hard document-shape gates on word count,
  * mean word length, symbol density, alphabetic-word ratio, and
  * stopword presence. Unlike q23's continuous quality SCORES, this
  * emits the per-rule booleans and the conjunctive pass/fail — the
  * actual drop decision, attributable rule by rule.
  *
  * All ratios are integer parts-per-myriad (the q37 no-FP
  * discipline), so the whole battery is one pure-map projection,
  * hash-exact vs a DuckDB replay of the same list ops. Thresholds
  * are the paper's structure with bounds calibrated to the synthetic
  * corpus so each data-dependent rule BITES non-degenerately
  * (probed: words 10–99 median 56, mean-wlen×100 370–530, stopword
  * p10 = 0); the symbol and alphabetic rules cannot fire on this
  * all-alpha corpus and are exercised by planted documents in the
  * spec instead — kept because a real web corpus is where they earn
  * their place.
  *
  * Scale: a stateless narrow projection — no shuffle, no join; scan
  * prunes to (doc_id, text); composes with any pushdown. The
  * cheapest possible 100 TB pre-filter, which is the point of
  * rule-first curation.
  */
object QualityRules {

  private val MinWords = 20L
  private val MaxWords = 100000L
  private val MinWlenX100 = 300L
  private val MaxWlenX100 = 520L
  private val MinAlphaMyriad = 8000L
  private val MaxSymbolMyriad = 1000L
  private val MinStopwords = 1L
  private val Stopwords = Seq("the", "and", "of", "to", "is", "it", "that", "for")

  def gopherRules(documents: DataFrame): DataFrame = {
    val toks = filter(split(lower(TextOps.wsTrim(col("text"))), "\\s+"),
      t => length(t) > 0)
    val stop = array(Stopwords.map(lit): _*)
    val withM = documents
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, b) => a + b).as("chars"),
        size(filter(col("toks"), t => t.rlike("^[a-z]+$"))).cast("long").as("alpha_words"),
        size(filter(col("toks"), t => t.rlike("#|\\.\\.\\."))).cast("long").as("sym_words"),
        size(filter(col("toks"), t => array_contains(stop, t))).cast("long").as("n_stop"))
    val m = withM.select(col("doc_id"), col("n_words"),
      when(col("n_words") === 0L, lit(0L))
        .otherwise(expr("chars * 100 div n_words")).as("wlen_x100"),
      when(col("n_words") === 0L, lit(0L))
        .otherwise(expr("alpha_words * 10000 div n_words")).as("alpha_myriad"),
      when(col("n_words") === 0L, lit(0L))
        .otherwise(expr("sym_words * 10000 div n_words")).as("symbol_myriad"),
      col("n_stop"))
    m.select(col("doc_id"), col("n_words"), col("wlen_x100"),
        col("alpha_myriad"), col("symbol_myriad"), col("n_stop"),
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).cast("long").as("r_words"),
        (col("wlen_x100") >= MinWlenX100 && col("wlen_x100") <= MaxWlenX100).cast("long").as("r_wlen"),
        (col("alpha_myriad") >= MinAlphaMyriad).cast("long").as("r_alpha"),
        (col("symbol_myriad") <= MaxSymbolMyriad).cast("long").as("r_symbol"),
        (col("n_stop") >= MinStopwords).cast("long").as("r_stop"))
      .withColumn("pass",
        (col("r_words") === 1L && col("r_wlen") === 1L && col("r_alpha") === 1L &&
          col("r_symbol") === 1L && col("r_stop") === 1L).cast("long"))
  }

  /** The q70 oracle: the identical list ops and integer myriad
    * ratios replayed over the q33 tokenization.
    */
  def gopherRulesOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(
       |           regexp_split_to_array(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')), '\\s+'),
       |           x -> length(x) > 0) AS toks
       |  FROM documents),
       |m0 AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS chars,
       |         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$$'))) AS BIGINT) AS alpha_words,
       |         CAST(len(list_filter(toks, x -> regexp_matches(x, '#|\\.\\.\\.'))) AS BIGINT) AS sym_words,
       |         CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','is','it','that','for'))) AS BIGINT) AS n_stop
       |  FROM t),
       |m AS (
       |  SELECT doc_id, n_words,
       |         CASE WHEN n_words = 0 THEN 0 ELSE chars * 100 // n_words END AS wlen_x100,
       |         CASE WHEN n_words = 0 THEN 0 ELSE alpha_words * 10000 // n_words END AS alpha_myriad,
       |         CASE WHEN n_words = 0 THEN 0 ELSE sym_words * 10000 // n_words END AS symbol_myriad,
       |         n_stop
       |  FROM m0)
       |SELECT doc_id, n_words, wlen_x100, alpha_myriad, symbol_myriad, n_stop,
       |       CAST(n_words >= $MinWords AND n_words <= $MaxWords AS BIGINT) AS r_words,
       |       CAST(wlen_x100 >= $MinWlenX100 AND wlen_x100 <= $MaxWlenX100 AS BIGINT) AS r_wlen,
       |       CAST(alpha_myriad >= $MinAlphaMyriad AS BIGINT) AS r_alpha,
       |       CAST(symbol_myriad <= $MaxSymbolMyriad AS BIGINT) AS r_symbol,
       |       CAST(n_stop >= $MinStopwords AS BIGINT) AS r_stop,
       |       CAST(n_words >= $MinWords AND n_words <= $MaxWords
       |            AND wlen_x100 >= $MinWlenX100 AND wlen_x100 <= $MaxWlenX100
       |            AND alpha_myriad >= $MinAlphaMyriad
       |            AND symbol_myriad <= $MaxSymbolMyriad
       |            AND n_stop >= $MinStopwords AS BIGINT) AS pass
       |FROM m""".stripMargin
}
