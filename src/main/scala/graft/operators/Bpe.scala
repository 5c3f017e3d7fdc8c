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
    val words = documents
      .select(explode(split(lower(TextOps.wsTrim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(SEP))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabCap)
      .select(concat(lit(SEP), regexp_replace(col("w"), "(.)", "$1" + SEP)).as("packed"),
        col("freq"))
      .localCheckpoint(true)
    trainLoopDistributed(documents.sparkSession, words, merges)
  }

  /** The distributed merge loop over a checkpointed (packed, freq)
    * frame — shared verbatim by the code-point (q67) and byte-level
    * (q67b) trainers, which differ only in how a word packs.
    */
  private def trainLoopDistributed(spark: org.apache.spark.sql.SparkSession,
                                   words: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
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
    rulesFrame(spark, out.toSeq)
  }

  /** (rank, lhs, rhs, cnt) rules as a frame — the shared trainer output. */
  private def rulesFrame(spark: org.apache.spark.sql.SparkSession,
                         out: Seq[(Long, String, String, Long)]): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "rank BIGINT, lhs STRING, rhs STRING, cnt BIGINT")
    if (out.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else spark.createDataFrame(
      spark.sparkContext.parallelize(out.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3, t._4))), outSchema)
  }

  /** UTF-8 binary string comparison — Spark orders STRING columns by
    * UTF8String binary comparison (= code-point order), which DIFFERS
    * from java.lang.String.compareTo (UTF-16 code-unit order) for
    * supplementary characters vs U+E000..U+FFFF. The in-memory trainer
    * must replay Spark's tie-break exactly, so it compares UTF-8 bytes.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** One merge application on a symbol array, replaying the packed
    * string's left-to-right non-overlapping `replace` EXACTLY —
    * including the shared-separator consequence: a match consumes the
    * separator BEFORE the next symbol, so after a merge at (i, i+1)
    * the pair (i+2, i+3) cannot start a match ('aaaa' → (aa)(a)(a),
    * 'aaaaaa' → (aa)(a)(aa)(a); probed identical to Spark/DuckDB
    * replace). `blocked` models the consumed leading separator.
    */
  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    var blocked = false
    while (i < syms.length) {
      if (!blocked && i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2; blocked = true
      } else {
        out += syms(i); i += 1; blocked = false
      }
    }
    out.toArray
  }

  /** q67 PRODUCTION-MERGES trainer — the deployable path for real
    * tokenizer sizings (Sennrich et al. 2016 report 10k–90k merges;
    * BERT/GPT-class vocabularies are 30k–50k): bit-equal to
    * `bpeTrain`'s sequential distributed loop (BpeSpec parity-pins
    * this), but with the merge loop IN MEMORY instead of one cluster
    * round-trip per merge.
    *
    * Why this is the right 100 TB shape: the corpus is touched exactly
    * ONCE (the same distributed word-frequency aggregate — that pass
    * is embarrassingly parallel and dominates at scale), and
    * everything after it is a function of the vocabCap-BOUNDED word
    * table — ≤ vocabCap packed strings, the documented bounded-collect
    * protocol (this is also how published BPE trainers work: subword-
    * nmt and the HuggingFace trainer both run the merge loop over an
    * in-memory word-count dict). The distributed loop's cost is
    * `merges` sequential job round-trips — at the ~0.1–0.3 s/job
    * scheduler floor, 30k merges is 1–2 driver-bound HOURS regardless
    * of cluster size; here the same 30k merges are pure computation on
    * ≤ vocabCap short arrays (sub-second), because the sequential
    * dependency between merges never needed the cluster at all.
    *
    * The loop keeps exact pair counts INCREMENTALLY (the subword-nmt
    * delta scheme): a pair→count map plus a pair→word-indices posting
    * index; each merge reprocesses ONLY the words containing the
    * merged pair (subtract their old adjacent-pair multiset, apply the
    * merge, add the new one), and the argmax is a lazy-deletion
    * max-heap ordered (cnt DESC, lhs ASC, rhs ASC) in Spark's UTF-8
    * binary string order — every count change pushes a fresh entry,
    * stale entries are skipped on pop. Per merge the work is
    * O(affected words × word length + heap pops), not O(vocab).
    */
  def bpeTrainFast(documents: DataFrame, vocabCap: Int = 256, merges: Int = 24): DataFrame = {
    val spark = documents.sparkSession
    // identical distributed corpus pass to bpeTrain (one aggregate);
    // the collect is vocabCap-bounded — tokenizer training's OUTPUT
    // is this table, the documented trainCodebook-class collect
    val packedRows = documents
      .select(explode(split(lower(TextOps.wsTrim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(SEP))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabCap)
      .select(concat(lit(SEP), regexp_replace(col("w"), "(.)", "$1" + SEP)).as("packed"),
        col("freq"))
      .collect()
    val words: Array[Array[String]] =
      packedRows.map(_.getString(0).split(SEP).filter(_.nonEmpty))
    val freqs: Array[Long] = packedRows.map(_.getLong(1))
    rulesFrame(spark, mergeLoopFast(words, freqs, merges))
  }

  /** The in-memory incremental merge loop (subword-nmt delta scheme) —
    * shared by the code-point (q67) and byte-level (q67b) fast
    * trainers; `words` mutates in place and holds the final
    * segmentation on return.
    */
  private[operators] def mergeLoopFast(words: Array[Array[String]],
                                       freqs: Array[Long],
                                       merges: Int): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    val counts = mutable.HashMap.empty[(String, String), Long]
    val postings = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // max-heap: larger cnt wins; ties broken by UTF-8-smaller (l, r)
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else {
          val cl = utf8Compare(a._2, b._2)
          if (cl != 0) -cl else -utf8Compare(a._3, b._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val nc = counts.getOrElse(p, 0L) + delta
      if (nc <= 0L) counts.remove(p) else counts(p) = nc
      if (delta > 0 && wi >= 0)
        postings.getOrElseUpdate(p, mutable.BitSet.empty) += wi
      if (nc > 0L) heap.enqueue((nc, p._1, p._2))
    }
    var wi = 0
    while (wi < words.length) {
      val s = words(wi)
      var i = 0
      while (i + 1 < s.length) { bump((s(i), s(i + 1)), freqs(wi), wi); i += 1 }
      wi += 1
    }

    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      // lazy-deletion pop: skip entries whose stored count is stale
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (counts.get((e._2, e._3)).contains(e._1)) top = Some(e)
      }
      top match {
        case None => exhausted = true
        case Some((cnt, l, r)) =>
          out += ((k.toLong, l, r, cnt))
          val pair = (l, r)
          val affected = postings.remove(pair).getOrElse(mutable.BitSet.empty)
          affected.foreach { w =>
            val old = words(w)
            var i = 0
            var has = false
            while (!has && i + 1 < old.length) {
              if (old(i) == l && old(i + 1) == r) has = true; i += 1
            }
            if (has) {
              i = 0
              while (i + 1 < old.length) { bump((old(i), old(i + 1)), -freqs(w), -1); i += 1 }
              val nw = applyMerge(old, l, r)
              words(w) = nw
              i = 0
              while (i + 1 < nw.length) { bump((nw(i), nw(i + 1)), freqs(w), w); i += 1 }
            }
          }
          // NOTE: no counts.remove(pair) — the alternating replace can
          // leave (l,r) occurrences ('aaaa' → (aa)(a)(a) keeps one),
          // and the subtract/re-add bumps already maintain its exact
          // surviving count; the pair may be re-learned later, exactly
          // as in the sequential loop.
          k += 1
      }
    }
    out.toSeq
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
    // rules via the in-memory trainer — bit-equal to bpeTrain
    // (BpeSpec parity) without its per-merge job round-trips
    val rules = bpeTrainFast(documents, vocabCap, merges).collect()
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
    // lambda captures; merges = 0 still needs ONE (no-op) column or
    // the brules CTE body would be an empty SELECT (r15 ADVICE)
    val ruleCols =
      if (merges == 0) "chr(2) AS p0, chr(2) AS s0"
      else (1 to merges).map { k =>
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
  def bpeTrainOracleSql(vocabCap: Int = 256, merges: Int = 24): String =
    s"""WITH ${cpBw0Sql(vocabCap)},
       |${oracleSteps(merges)}
       |SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, cnt FROM (
       |${oracleRanks(merges)})""".stripMargin

  /** The unrolled merge-loop CTE triples — identical for code-point
    * and byte-level training (only bw0's packing differs).
    */
  private def oracleSteps(merges: Int): String =
    (1 to merges).map { k =>
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

  private def oracleRanks(merges: Int): String =
    (1 to merges).map(k =>
      s"SELECT $k AS rank, l AS lhs, r AS rhs, cnt FROM bm$k").mkString("\nUNION ALL\n")

  /** q67's bw0: whitespace words, one SYMBOL PER CODE POINT. */
  private def cpBw0Sql(vocabCap: Int): String = {
    val trimRe = "'^\\s+|\\s+$'"
    s"""bw0 AS MATERIALIZED (
       |  SELECT chr(1) || regexp_replace(w, '(.)', '\\1' || chr(1), 'g') AS packed, freq
       |  FROM (
       |    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |      SELECT unnest(regexp_split_to_array(
       |               lower(regexp_replace(text, $trimRe, '', 'g')), '\\s+')) AS w
       |      FROM documents) t
       |    WHERE length(w) > 0 AND NOT contains(w, chr(1))
       |    GROUP BY w ORDER BY freq DESC, w ASC LIMIT $vocabCap))""".stripMargin
  }

  // ------------------------------------------------------------------
  // q67b/q68b: BYTE-LEVEL BPE with regex pre-tokenization — the
  // GPT-2/Llama tokenizer shape (Radford et al. 2019 §2.2: BPE over
  // UTF-8 BYTES so any string encodes with a 256-symbol base alphabet
  // and zero OOV, pre-tokenized by a regex that keeps the LEADING
  // SPACE attached to each token — the 'Ġ'-prefix convention).
  // ------------------------------------------------------------------

  /** The pre-tokenizer (on the lowered, end-trimmed text): letter
    * runs, digit runs, punctuation runs — each with an optional
    * leading space. Deliberately inside the Java∩RE2-identical subset
    * (alternatives disjoint on their first non-space character, so
    * leftmost-first and leftmost-longest agree): GPT-2's exact pattern
    * needs negative lookahead, which RE2 (the DuckDB oracle engine)
    * rejects. Runs of extra whitespace match nothing and drop; the
    * single leading space IS a byte of the token (0x20 participates
    * in merges — the byte-level signature).
    */
  final val PreTokPat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"

  /** A word packs as its UTF-8 byte stream, ONE SYMBOL PER BYTE, each
    * byte spelled as its 2-char uppercase hex pair — symbols stay
    * plain ASCII strings, so the whole q67 machinery (0x01-separated
    * packing, plain-replace merge application, (cnt DESC, lhs, rhs)
    * tie-break) applies unchanged, and both engines spell bytes
    * identically (`hex()` of the UTF-8 encoding). A multi-byte code
    * point's bytes are independent symbols — merges can and do cross
    * UTF-8 character boundaries, the byte-level property the spec
    * pins (round-trip through `unhex` restores the exact bytes).
    */
  private def bytePackedCol(w: Column): Column =
    concat(lit(SEP), regexp_replace(hex(w), "(..)", "$1" + SEP))

  private def bytePretokens(documents: DataFrame): DataFrame =
    documents.select(explode(regexp_extract_all(
      lower(TextOps.wsTrim(col("text"))), lit(PreTokPat), lit(0))).as("w"))

  private def byteWordTable(documents: DataFrame, vocabCap: Int): DataFrame =
    bytePretokens(documents)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabCap)
      .select(bytePackedCol(col("w")).as("packed"), col("freq"))

  /** q67b reference trainer: the distributed loop on byte symbols. */
  def byteBpeTrain(documents: DataFrame, vocabCap: Int = 256, merges: Int = 24): DataFrame =
    trainLoopDistributed(documents.sparkSession,
      byteWordTable(documents, vocabCap).localCheckpoint(true), merges)

  /** q67b registered trainer: the in-memory loop (bit-equal to
    * [[byteBpeTrain]] — ByteBpeSpec parity-pins it, the q67
    * fast-trainer contract on byte symbols).
    */
  def byteBpeTrainFast(documents: DataFrame, vocabCap: Int = 256,
                       merges: Int = 24): DataFrame = {
    val spark = documents.sparkSession
    val packedRows = byteWordTable(documents, vocabCap).collect()
    val words: Array[Array[String]] =
      packedRows.map(_.getString(0).split(SEP).filter(_.nonEmpty))
    val freqs: Array[Long] = packedRows.map(_.getLong(1))
    rulesFrame(spark, mergeLoopFast(words, freqs, merges))
  }

  /** q68b: the corpus byte-encoded with q67b's rules — every
    * pre-token's byte stream through the K merges in rank order (one
    * pure-map expression, zero joins; OOV is IMPOSSIBLE by
    * construction, the byte-level point). Output (doc_id, n_subwords,
    * subtext) where subtext is the space-joined hex-symbol stream;
    * stripping spaces and `unhex`-ing restores the pre-token bytes
    * exactly (spec-pinned).
    */
  def byteBpeEncode(documents: DataFrame, vocabCap: Int = 256,
                    merges: Int = 24): DataFrame = {
    val rules = byteBpeTrainFast(documents, vocabCap, merges).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val toks = regexp_extract_all(
      lower(TextOps.wsTrim(coalesce(col("text"), lit("")))), lit(PreTokPat), lit(0))
    val encoded = (t: Column) => {
      val merged = rules.foldLeft(bytePackedCol(t)) { case (acc, (_, l, r)) =>
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

  /** q67b's bw0: regex pre-tokens, one symbol per UTF-8 byte (hex). */
  private def byteBw0Sql(vocabCap: Int): String = {
    val trimRe = "'^\\s+|\\s+$'"
    s"""bw0 AS MATERIALIZED (
       |  SELECT chr(1) || regexp_replace(hex(w), '(..)', '\\1' || chr(1), 'g') AS packed, freq
       |  FROM (
       |    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |      SELECT unnest(regexp_extract_all(
       |               lower(regexp_replace(text, $trimRe, '', 'g')), '$PreTokPat')) AS w
       |      FROM documents) t
       |    GROUP BY w ORDER BY freq DESC, w ASC LIMIT $vocabCap))""".stripMargin
  }

  /** The q67b oracle: the q67 merge-step CTEs verbatim over the byte
    * packing.
    */
  def byteBpeTrainOracleSql(vocabCap: Int = 256, merges: Int = 24): String =
    s"""WITH ${byteBw0Sql(vocabCap)},
       |${oracleSteps(merges)}
       |SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, cnt FROM (
       |${oracleRanks(merges)})""".stripMargin

  /** The q68b oracle: rules re-derived through the q67b chain, encode
    * replayed as nested replaces over the byte packing (the q68
    * captured-column rule CTE — DuckDB lambdas reject subqueries).
    */
  def byteBpeEncodeOracleSql(vocabCap: Int = 256, merges: Int = 24): String = {
    val trainSql = byteBpeTrainOracleSql(vocabCap, merges)
    val chain = trainSql.substring(0, trainSql.lastIndexOf("SELECT CAST(rank"))
      .trim.stripSuffix(",")
    val packed = "chr(1) || regexp_replace(hex(t), '(..)', '\\1' || chr(1), 'g')"
    // merges = 0: one no-op rule column, same rationale as
    // bpeEncodeOracleSql (r15 ADVICE — an empty ruleCols emitted
    // `SELECT )`)
    val ruleCols =
      if (merges == 0) "chr(2) AS p0, chr(2) AS s0"
      else (1 to merges).map { k =>
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
       |           regexp_extract_all(
       |             lower(regexp_replace(coalesce(text, ''), '^\\s+|\\s+$$', '', 'g')),
       |             '$PreTokPat'),
       |           t -> trim(translate($mergedExpr, chr(1), ' '))), ' ') AS subtext
       |  FROM documents CROSS JOIN brules)
       |SELECT doc_id,
       |       CASE WHEN length(subtext) = 0 THEN 0
       |            ELSE CAST(len(string_split(subtext, ' ')) AS BIGINT) END AS n_subwords,
       |       subtext
       |FROM enc""".stripMargin
  }
}
