package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q67: BPE MERGE TRAINING (Sennrich/Haddow/Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * tokenizer-TRAINING step q51's greedy inference consumes: from a
  * word-frequency table, iteratively merge the most frequent adjacent
  * symbol pair (count DESC, then (lhs, rhs) ASC — the deterministic
  * tie-break the paper leaves open). Output: one row per learned rule
  * (rank, lhs, rhs, cnt), hash-exact vs a DuckDB replay of the
  * identical loop. Reference analog: none (the Kafka Streams demo has
  * no tokenizer); this completes graft's tokenizer stack — q33 builds
  * word vocabularies, q67 learns the subword rules, q51 applies them.
  */
object Bpe {

  /** Words are packed as 0x01-separated symbol strings, so one merge
    * application is ONE plain left-to-right non-overlapping `replace`
    * in both engines (DuckDB-probed identical). Contract consequence,
    * pinned by spec AND oracle: adjacent merge sites SHARE a
    * separator, so a run of ≥4 of one pair merges alternately in that
    * pass ('aaaa' → (aa)(a)(a), not canonical BPE's (aa)(aa)); the
    * leftover pair stays countable and may be re-learned as a later
    * rule. Bit-deterministic in both engines; on natural text the
    * deviation (runs ≥ 4 of one pair inside a word) is negligible —
    * and honesty beats pretending canonical greedy is SQL-replayable.
    */
  private val SEP = "\u0001"

  /** Scale: the CORPUS is touched exactly once (the q33 token agg);
    * the merge loop runs on the vocabCap-bounded word table — each
    * iteration is one vocab-sized pair aggregate, a 1-row TakeOrdered
    * collect, and a pure-map replace, checkpointed flat. At 100 TB
    * the corpus pass dominates and is embarrassingly parallel;
    * raising vocabCap to real sizings (50k words, 30k merges) changes
    * only the bounded loop. Words containing the 0x01 separator are
    * excluded (both engines — the documented guard). The registered
    * instance pins vocabCap=256, merges=24 (the unrolled-CTE
    * checkability contract).
    */
  def bpeTrain(documents: DataFrame, vocabCap: Int = 256, merges: Int = 24): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "rank BIGINT, lhs STRING, rhs STRING, cnt BIGINT")
    val words = documents
      .select(explode(split(lower(TextOps.wsTrim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(SEP))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabCap)
      .select(concat(lit(SEP), regexp_replace(col("w"), "(.)", "$1" + SEP)).as("packed"),
        col("freq"))
      .localCheckpoint(true)
    var cur = words
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var done = false
    for (k <- 1 to merges if !done) {
      val syms = filter(split(col("packed"), SEP), s => length(s) > 0)
      val pairs = zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a: Column, b: Column) => struct(a.as("l"), b.as("r")))
      val top = cur.select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).as[(String, String, Long)].collect()
      top.headOption match {
        case None => done = true
        case Some((l, r, cnt)) =>
          out += ((k.toLong, l, r, cnt))
          // NO per-iteration checkpoint: lineage is only k nested
          // replaces over the checkpointed word base (CollapseProject
          // folds them into one projection). Skipping the checkpoint
          // job halves the loop's job count, though the driver
          // round-trip of the 24 sequential argmax collects dominates
          // either way (probed 2.80 → 2.72 s min at sf0.1) — inherent
          // to the algorithm's sequential dependency, and bounded by
          // `merges`, not the corpus.
          cur = cur.select(
            org.apache.spark.sql.functions.replace(col("packed"),
              lit(SEP + l + SEP + r + SEP), lit(SEP + l + r + SEP)).as("packed"),
            col("freq"))
      }
    }
    if (out.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3, t._4))), outSchema)
  }

  /** q68: BPE ENCODING of the corpus with the rules q67 just learned —
    * the train→apply composition a tokenizer pipeline actually runs
    * (and the subword-level twin of q51's vocab-greedy inference).
    * Trains on the same corpus (identical loop, so the rules are the
    * q67 output bit-for-bit), then encodes EVERY document: tokens →
    * 0x01-packed symbols → the K merges applied IN RANK ORDER as K
    * nested plain `replace`s — one pure-map expression over the
    * corpus, zero joins, corpus touched exactly twice total (the
    * train aggregate + the encode scan). Out-of-vocabulary words
    * (outside the train cap) are still encoded — rules apply wherever
    * their pair occurs, the standard BPE property. Output: (doc_id,
    * n_subwords, subtext) where subtext is the space-joined subword
    * stream of the normalized document — hash-exact vs the oracle
    * that re-derives the rules through the q67 CTE chain and encodes
    * with scalar-subquery replaces (exhausted merges degrade to
    * chr(2) no-op patterns).
    */
  def bpeEncode(documents: DataFrame, vocabCap: Int = 256, merges: Int = 24): DataFrame = {
    val spark = documents.sparkSession
    val rules = bpeTrain(documents, vocabCap, merges).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val toks = filter(
      split(lower(TextOps.wsTrim(coalesce(col("text"), lit("")))), "\\s+"),
      t => length(t) > 0 && !t.contains(SEP))
    val encoded = (t: Column) => {
      val packed = concat(lit(SEP), regexp_replace(t, "(.)", "$1" + SEP))
      val merged = rules.foldLeft(packed) { case (acc, (_, l, r)) =>
        org.apache.spark.sql.functions.replace(acc,
          lit(SEP + l + SEP + r + SEP), lit(SEP + l + r + SEP))
      }
      btrim(translate(merged, SEP, " "))
    }
    documents.select(col("doc_id"),
        array_join(transform(toks, encoded), " ").as("subtext"))
      .select(col("doc_id"),
        when(length(col("subtext")) === 0, lit(0L))
          .otherwise(size(split(col("subtext"), " ")).cast("long")).as("n_subwords"),
        col("subtext"))
  }

  /** The q68 oracle: the q67 chain re-derives the rules, then the
    * encode replays as nested replaces whose patterns come from
    * scalar subqueries over the bm CTEs.
    */
  def bpeEncodeOracleSql(vocabCap: Int = 256, merges: Int = 24): String = {
    val trainSql = bpeTrainOracleSql(vocabCap, merges)
    // keep only the WITH chain: strip the final merge-list SELECT
    val chain = trainSql.substring(0, trainSql.lastIndexOf("SELECT CAST(rank"))
      .trim.stripSuffix(",")
    val packed = "chr(1) || regexp_replace(t, '(.)', '\\1' || chr(1), 'g')"
    // DuckDB lambdas reject subqueries, so the 24 pattern/replacement
    // pairs ride as columns of a cross-joined single-row CTE the
    // lambda captures
    val ruleCols = (1 to merges).map { k =>
      s"""coalesce((SELECT chr(1)||l||chr(1)||r||chr(1) FROM bm$k), chr(2)) AS p$k,
         |    coalesce((SELECT chr(1)||l||r||chr(1) FROM bm$k), chr(2)) AS s$k""".stripMargin
    }.mkString(",\n    ")
    val mergedExpr = (1 to merges).foldLeft(packed) { (acc, k) =>
      s"replace($acc, p$k, s$k)"
    }
    s"""$chain,
       |brules AS MATERIALIZED (
       |  SELECT
       |    $ruleCols),
       |enc AS MATERIALIZED (
       |  SELECT doc_id,
       |         array_to_string(list_transform(
       |           list_filter(regexp_split_to_array(
       |               lower(regexp_replace(coalesce(text, ''), '^\\s+|\\s+$$', '', 'g')), '\\s+'),
       |             t -> length(t) > 0 AND NOT contains(t, chr(1))),
       |           t -> trim(translate($mergedExpr, chr(1), ' '))), ' ') AS subtext
       |  FROM documents CROSS JOIN brules)
       |SELECT doc_id,
       |       CASE WHEN length(subtext) = 0 THEN 0
       |            ELSE CAST(len(string_split(subtext, ' ')) AS BIGINT) END AS n_subwords,
       |       subtext
       |FROM enc""".stripMargin
  }

  /** The q67 oracle: the identical loop unrolled — per merge one pair
    * aggregate (unnest over a dependent range list), a 1-row argmax
    * CTE, and a LEFT-JOIN-coalesce apply so an exhausted corpus
    * degrades to no-op CTEs instead of an empty cascade.
    */
  def bpeTrainOracleSql(vocabCap: Int = 256, merges: Int = 24): String = {
    val steps = (1 to merges).map { k =>
      s"""bp$k AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(syms)),
         |             i -> {'l': syms[CAST(i AS INT)], 'r': syms[CAST(i AS INT)+1]})) AS p,
         |           freq
         |    FROM (SELECT list_filter(string_split(packed, chr(1)), x -> x <> '') AS syms,
         |                 freq FROM bw${k - 1}) t)
         |  GROUP BY p.l, p.r),
         |bm$k AS (SELECT l, r, cnt FROM bp$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |bw$k AS MATERIALIZED (
         |  SELECT CASE WHEN m.l IS NULL THEN packed
         |              ELSE replace(packed, chr(1)||m.l||chr(1)||m.r||chr(1),
         |                           chr(1)||m.l||m.r||chr(1)) END AS packed, freq
         |  FROM bw${k - 1} LEFT JOIN bm$k m ON TRUE)""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to merges).map(k =>
      s"SELECT $k AS rank, l AS lhs, r AS rhs, cnt FROM bm$k").mkString("\nUNION ALL\n")
    val trimRe = "'^\\s+|\\s+$'"
    s"""WITH bw0 AS MATERIALIZED (
       |  SELECT chr(1) || regexp_replace(w, '(.)', '\\1' || chr(1), 'g') AS packed, freq
       |  FROM (
       |    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |      SELECT unnest(regexp_split_to_array(
       |               lower(regexp_replace(text, $trimRe, '', 'g')), '\\s+')) AS w
       |      FROM documents) t
       |    WHERE length(w) > 0 AND NOT contains(w, chr(1))
       |    GROUP BY w ORDER BY freq DESC, w ASC LIMIT $vocabCap)),
       |$steps
       |SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, cnt FROM (
       |$ranks)""".stripMargin
  }
}
