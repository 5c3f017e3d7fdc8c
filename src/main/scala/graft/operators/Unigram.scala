package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q101: UNIGRAM-LM (SentencePiece) TOKENIZER TRAINING — the other
  * mainstream subword trainer (Kudo, "Subword Regularization: Improving
  * Neural Network Translation Models with Multiple Subword Candidates",
  * ACL 2018 §3; the `--model_type=unigram` SentencePiece default that
  * Llama/T5-class pipelines actually ship). Completes the tokenizer
  * family: q33 word vocab, q67/q68 BPE train/encode, q51 greedy
  * inference — and now the likelihood-trained unigram model with
  * Viterbi inference (q101b).
  *
  * Algorithm (the paper's loop with every arbitrary choice pinned):
  *  1. SEED: the `seedCap` most frequent substrings of length
  *     2..`seedMaxLen` of the `wordCap` most frequent corpus words
  *     (occurrence-weighted by word frequency, overlapping occurrences
  *     counted), plus EVERY single code point of those words (the
  *     paper's character-coverage floor — chars are never pruned, so
  *     segmentation is always feasible).
  *  2. EM (`emIters` rounds of VITERBI EM — the hard-EM variant: the
  *     E-step keeps only the max-probability segmentation instead of
  *     the full lattice's expectations. The soft E-step needs
  *     sum-of-products of probabilities (log-sum-exp — libm), which no
  *     integer oracle can replay; hard EM keeps every step in int64
  *     and is the documented deterministic variant, the same honesty
  *     trade as q67's alternating-replace note): segment every word
  *     under the current costs ([[graft.functions.UnigramSegExpr]] —
  *     ties to the LONGEST piece), count piece occurrences weighted by
  *     word frequency, then re-cost
  *         cost(x) = L(T + V) − L(c(x) + 1)
  *     in Q16 log2 units (L = Log2Q16; add-one smoothing keeps unused
  *     characters finite; T = Σ counts over the surviving vocab, V its
  *     size — i.e. cost = −log2 of the smoothed unigram probability).
  *     Multi-piece entries with zero count drop (the paper's implicit
  *     prune-by-zero); characters always survive.
  *  3. PRUNE by LIKELIHOOD LOSS (the paper's §3.2 ranking under the
  *     hard-EM objective): for each multi-character piece x,
  *         loss(x) = c(x) · (altCost(x) − cost(x))
  *     where altCost(x) is the Viterbi cost of segmenting x's own
  *     string WITHOUT the full-span piece (SentencePiece's
  *     remove-one-at-a-time approximation: no re-normalization inside
  *     a prune round). Keep the top `multiKeep` by (loss DESC,
  *     cnt DESC, piece ASC in UTF-8 order) plus all characters.
  *  4. One final hard-EM step on the pruned vocabulary re-counts and
  *     re-costs (the paper's EM-after-prune), producing the model.
  *
  * Output: (piece STRING, cnt BIGINT, cost_q16 BIGINT) — cnt the final
  * Viterbi occurrence count (0 possible for characters absorbed into
  * longer pieces), cost_q16 the smoothed −log2 probability in Q16.
  * ORACLE-EXACT: every step is integer arithmetic + the Log2Q16 kernel,
  * and the whole loop — seeding, three Viterbi passes, the loss
  * ranking — unrolls into one DuckDB CTE program (recursive DP +
  * backwalk per pass, the q55/q60 unrolling discipline; see
  * SparkEntry.unigramTrainOracleSql).
  *
  * Scale shape (the bpeTrainFast argument): the CORPUS is touched
  * exactly once — the embarrassingly-parallel word-frequency
  * aggregate; everything after runs on the `wordCap`-BOUNDED word
  * frame (a localCheckpointed ≤wordCap-row table — each EM pass is one
  * segmentation map + one piece-count aggregate over it, vocab-sized
  * collects only: the trainCodebook bounded protocol). Real sizings
  * (1M seed pieces, 8 EM rounds, 32k vocab) change the bounded loop's
  * constants, never the corpus cost. Reference framing: the reference
  * (nbuesing/kafka-streams-repartition) has no tokenizer surface; this
  * extends SURVEY §2's LLM-pipeline family.
  */
object Unigram {

  /** Cost charged to an unknown single code point at ENCODE time (a
    * character outside the training vocabulary): 64.0 in Q16 log2
    * units — "probability 2^-64", dearer than any smoothed piece cost
    * a real corpus produces (cost ≤ L(T+V) ≤ log2(2^63) < 64), so
    * known pieces always win, while OOV text stays segmentable (the
    * byte-fallback analog; the unknown code point is emitted
    * verbatim). Training words never hit it: their characters are in
    * the vocab by construction.
    */
  final val UnkCostQ16: Long = 64L << 16

  case class Model(pieces: Seq[(String, Long, Long)]) {
    /** (piece → cost) map the segmenter consumes. */
    def costs: Seq[(String, Long)] = pieces.map(p => (p._1, p._3))
  }

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The capped word-frequency frame — the ONE corpus pass (shared by
    * train and encode; the q67 word-table contract: lower + \s+ split,
    * (freq DESC, w ASC) cap).
    */
  private def wordFrame(documents: DataFrame, wordCap: Int): DataFrame =
    documents
      .select(explode(split(lower(TextOps.wsTrim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(wordCap)
      .localCheckpoint(true)

  /** Proper compositions of n (all orderings of parts summing to n,
    * excluding the single part [n]) — ≤ 2^(n-1) − 1 lists; n ≤ 7.
    */
  private[operators] def properCompositions(n: Int): Seq[Seq[Int]] = {
    def all(m: Int): Seq[Seq[Int]] =
      if (m == 0) Seq(Seq.empty)
      else (1 to m).flatMap(h => all(m - h).map(h +: _))
    all(n).filterNot(_ == Seq(n))
  }

  /** Train the model; all collects are wordCap/seedCap/vocab-bounded. */
  def unigramFit(documents: DataFrame, wordCap: Int = 256,
                 seedMaxLen: Int = 4, seedCap: Int = 48,
                 emIters: Int = 2, multiKeep: Int = 24): Model = {
    require(seedMaxLen >= 2 && seedMaxLen <= 7 && wordCap > 0 &&
      seedCap >= 0 && emIters >= 1 && multiKeep >= 0,
      "q101 parameters out of range")
    val spark = documents.sparkSession
    val words = wordFrame(documents, wordCap)

    // --- 1. seeding: one substring explode over the bounded word frame
    val subCnt = words.select(explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s ->
           |  transform(sequence(1, least($seedMaxLen, length(w) - s + 1)), l ->
           |    substr(w, s, l))))""".stripMargin)).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .localCheckpoint(true)
    val chars: Seq[(String, Long)] = subCnt.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortWith((a, b) => utf8Lt(a._1, b._1))
    val seeds: Seq[(String, Long)] = subCnt.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val charSet = chars.map(_._1).toSet

    def recost(counts: Map[String, Long], vocab: Seq[String]): Seq[(String, Long)] = {
      val t = vocab.iterator.map(p => counts.getOrElse(p, 0L)).sum
      val tv = t + vocab.size
      val ltv = graft.functions.Log2Q16Expr.compute(tv)
      vocab.map(p => p ->
        (ltv - graft.functions.Log2Q16Expr.compute(counts.getOrElse(p, 0L) + 1L)))
    }

    // one hard-EM pass: segment the word frame under `costs`, count
    // pieces weighted by freq (vocab-sized collect)
    def emCounts(costs: Seq[(String, Long)]): Map[String, Long] = {
      import graft.functions.UnigramSegFunctions.unigram_seg
      words.select(explode(
          unigram_seg(col("w"), costs, seedMaxLen, UnkCostQ16)).as("piece"),
          col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    val counts0 = (chars ++ seeds).toMap
    var vocab: Seq[String] = chars.map(_._1) ++ seeds.map(_._1)
    var costs: Seq[(String, Long)] = recost(counts0, vocab)
    var counts: Map[String, Long] = counts0
    for (_ <- 1 to emIters) {
      counts = emCounts(costs)
      vocab = vocab.filter(p => charSet(p) || counts.getOrElse(p, 0L) > 0L)
      costs = recost(counts, vocab)
    }

    // --- 3. prune multis by likelihood loss (driver-side: pieces are
    // ≤ seedMaxLen code points, vocab in hand — exact, bounded work)
    val lut = new java.util.HashMap[String, java.lang.Long]()
    costs.foreach { case (p, c) => lut.put(p, c) }
    val multis = costs.filterNot(pc => charSet(pc._1))
    val ranked = multis.map { case (p, c) =>
      val alt = graft.functions.UnigramSegExpr.segCost(
        p, lut, seedMaxLen, UnkCostQ16, banFullSpan = true)
      val cnt = counts.getOrElse(p, 0L)
      // EXACTNESS BOUND (the q99/q63 2^53-style discipline, here on
      // int64): loss = cnt·Δcost must satisfy |cnt·Δcost| < 2^63 or
      // the JVM multiply wraps silently while the DuckDB BIGINT raises
      // — a silent-vs-loud divergence instead of a hash mismatch.
      // Δcost ≤ seedMaxLen·UnkCostQ16 + cost ceiling < 2^26 here, so
      // the guard only ever fires past cnt ≈ 2^37 piece occurrences;
      // multiplyHigh makes the check exact at any magnitude.
      val d = alt - c
      require(Math.multiplyHigh(cnt, d) == (if ((cnt * d) < 0) -1L else 0L),
        s"unigram prune loss overflows int64 for piece '$p' " +
          s"(cnt=$cnt, dcost=$d) — exactness bound |cnt*dcost| < 2^63 violated")
      (p, cnt, cnt * d)
    }.sortWith { (a, b) =>
      if (a._3 != b._3) a._3 > b._3
      else if (a._2 != b._2) a._2 > b._2
      else utf8Lt(a._1, b._1)
    }
    val kept = ranked.take(multiKeep).map(_._1).toSet

    // --- 4. final hard-EM step on the pruned vocabulary
    val prunedCosts = costs.filter(pc => charSet(pc._1) || kept(pc._1))
    val countsF = emCounts(prunedCosts)
    val vocabF = prunedCosts.map(_._1)
      .filter(p => charSet(p) || countsF.getOrElse(p, 0L) > 0L)
    val costsF = recost(countsF, vocabF).toMap
    Model(vocabF.map(p => (p, countsF.getOrElse(p, 0L), costsF(p))))
  }

  /** q101 registered entry: the trained model as a frame. */
  def unigramTrain(documents: DataFrame, wordCap: Int = 256,
                   seedMaxLen: Int = 4, seedCap: Int = 48,
                   emIters: Int = 2, multiKeep: Int = 24): DataFrame = {
    val spark = documents.sparkSession
    val m = unigramFit(documents, wordCap, seedMaxLen, seedCap, emIters, multiKeep)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "piece STRING, cnt BIGINT, cost_q16 BIGINT")
    spark.createDataFrame(
      spark.sparkContext.parallelize(m.pieces.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3))), schema)
  }

  /** q101b: VITERBI ENCODE of the corpus with the model q101 just
    * trained — the train→apply composition (the q68 shape for the
    * unigram family). One pure-map expression over the corpus: zero
    * joins, zero exchanges past the training aggregate; unknown code
    * points (outside the capped training words) fall back per
    * [[UnkCostQ16]] and are emitted verbatim. Output: (doc_id,
    * n_pieces, subtext) — the space-joined piece stream of the
    * lowered document.
    */
  def unigramEncode(documents: DataFrame, wordCap: Int = 256,
                    seedMaxLen: Int = 4, seedCap: Int = 48,
                    emIters: Int = 2, multiKeep: Int = 24): DataFrame = {
    import graft.functions.UnigramSegFunctions.unigram_seg
    val m = unigramFit(documents, wordCap, seedMaxLen, seedCap, emIters, multiKeep)
    documents.select(col("doc_id"),
        unigram_seg(lower(TextOps.wsTrim(coalesce(col("text"), lit("")))),
          m.costs, seedMaxLen, UnkCostQ16).as("pieces"))
      .select(col("doc_id"), size(col("pieces")).cast("long").as("n_pieces"),
        array_join(col("pieces"), " ").as("subtext"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle builders (the q67/q55 unrolling discipline): the
  // whole trainer — seeding, emIters+1 Viterbi passes as recursive
  // DP + backwalk CTEs, Q16 log costs via the q61 shift-and-square
  // replay, composition-enumerated prune losses — as ONE generated
  // CTE program.
  // ------------------------------------------------------------------

  /** The q61 16-step log2 Q16 replay over `u_vals$k`. */
  private def logCte(k: String): String =
    s"""u_s$k(x, z, r, i) AS (
       |  SELECT x, (x * 65536) // (1::BIGINT << (length(bin(x)) - 1)),
       |         CAST(length(bin(x)) - 1 AS BIGINT) * 65536, 0
       |  FROM u_vals$k
       |  UNION ALL
       |  SELECT x,
       |         CASE WHEN (z*z) // 65536 >= 131072
       |              THEN ((z*z) // 65536) // 2 ELSE (z*z) // 65536 END,
       |         CASE WHEN (z*z) // 65536 >= 131072
       |              THEN r + (1::BIGINT << (16 - (i + 1))) ELSE r END,
       |         i + 1
       |  FROM u_s$k WHERE i < 16)""".stripMargin

  /** cost block `k` over vocabulary CTE `vocSrc` (piece, cnt):
    * u_tv, u_vals, u_s (log replay), u_cost (piece, cnt, cost), u_vm.
    */
  private def costBlock(k: String, vocSrc: String): String =
    s"""u_tv$k AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS tv FROM $vocSrc),
       |u_vals$k AS (SELECT DISTINCT x FROM (
       |  SELECT cnt + 1 AS x FROM $vocSrc UNION SELECT tv FROM u_tv$k) t),
       |${logCte(k)},
       |u_cost$k AS MATERIALIZED (
       |  SELECT v.piece, v.cnt, lt.r - lc.r AS cost
       |  FROM $vocSrc v
       |  JOIN u_s$k lc ON lc.i = 16 AND lc.x = v.cnt + 1
       |  JOIN u_s$k lt ON lt.i = 16 AND lt.x = (SELECT tv FROM u_tv$k)),
       |u_vm$k AS (SELECT map(list(piece ORDER BY piece),
       |                      list(cost ORDER BY piece)) AS m FROM u_cost$k)""".stripMargin

  /** Viterbi DP + backwalk + weighted piece counts over `u_words`
    * under map CTE `vm`; `unkFallback` enables the encode-time
    * single-code-point UNK ladder (training passes never need it:
    * every character of `u_words` is in the vocab by construction).
    * DP candidates pack as (best + cost)·8 + (L − l) so `list_min`
    * replays the kernel's (cost ASC, piece-length DESC) tie-break.
    */
  private def viterbiBlock(k: String, vm: String, wordsSrc: String, L: Int,
                           unkFallback: Boolean): String = {
    val look = s"map_extract(m, substr(w, j + 2 - CAST(l AS INT), CAST(l AS INT)))[1]"
    val cand =
      if (unkFallback)
        s"""CASE WHEN l = 1 THEN
           |  (best[j + 2 - CAST(l AS INT)] + COALESCE($look, ${UnkCostQ16}::BIGINT)) * 8 + ($L - l)
           |ELSE CASE WHEN $look IS NULL THEN NULL
           |  ELSE (best[j + 2 - CAST(l AS INT)] + $look) * 8 + ($L - l) END END""".stripMargin
      else
        s"""CASE WHEN $look IS NULL THEN NULL
           |  ELSE (best[j + 2 - CAST(l AS INT)] + $look) * 8 + ($L - l) END""".stripMargin
    s"""u_vit$k(w, freq, j, best, bp) AS (
       |  SELECT w, freq, 0, [CAST(0 AS BIGINT)], [CAST(0 AS BIGINT)] FROM $wordsSrc
       |  UNION ALL
       |  SELECT w, freq, j + 1, list_append(best, cand // 8),
       |         list_append(bp, $L - (cand % 8))
       |  FROM (
       |    SELECT w, freq, j, best, bp,
       |      list_min(list_filter(list_transform(range(1, least($L, j + 1) + 1),
       |        l -> $cand), x -> x IS NOT NULL)) AS cand
       |    FROM u_vit$k CROSS JOIN $vm WHERE j < length(w)) t),
       |u_fin$k AS (SELECT w, freq, bp FROM u_vit$k WHERE j = length(w)),
       |u_walk$k(w, freq, pos, bp, pieces) AS (
       |  SELECT w, freq, length(w), bp, CAST([] AS VARCHAR[]) FROM u_fin$k
       |  UNION ALL
       |  SELECT w, freq, pos - CAST(bp[pos + 1] AS INT), bp,
       |         list_prepend(substr(w, pos - CAST(bp[pos + 1] AS INT) + 1,
       |                             CAST(bp[pos + 1] AS INT)), pieces)
       |  FROM u_walk$k WHERE pos > 0),
       |u_cnt$k AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(pieces) AS piece, freq FROM u_walk$k WHERE pos = 0) t
       |  GROUP BY 1),
       |u_voc$k AS MATERIALIZED (
       |  SELECT c.piece, COALESCE(n.cnt, 0) AS cnt
       |  FROM u_chars c LEFT JOIN u_cnt$k n USING (piece)
       |  UNION ALL
       |  SELECT n.piece, n.cnt FROM u_cnt$k n WHERE length(n.piece) >= 2)""".stripMargin
  }

  /** alt-cost expression for one piece length: `list_min` over the
    * proper compositions' summed lookups (a NULL part — a sub-piece
    * outside the vocab — voids its composition; the all-singles
    * composition is always valid, so the min never comes up empty).
    */
  private def altExpr(maxLen: Int): String = {
    def lk(start: Int, len: Int) =
      s"map_extract(m, substr(piece, $start, $len))[1]"
    val cases = (2 to maxLen).map { n =>
      val comps = properCompositions(n).map { parts =>
        var pos = 1
        parts.map { p => val e = lk(pos, p); pos += p; e }.mkString(" + ")
      }
      s"WHEN length(piece) = $n THEN list_min(list_filter([${comps.mkString(", ")}], x -> x IS NOT NULL))"
    }
    s"CASE ${cases.mkString(" ")} END"
  }

  /** Shared train chain: everything through the FINAL cost table
    * `u_costF` (piece, cnt, cost). Both oracles build on it.
    */
  private def trainChain(wordCap: Int, seedMaxLen: Int, seedCap: Int,
                         emIters: Int, multiKeep: Int): String = {
    val L = seedMaxLen
    val em = (1 to emIters).map { k =>
      viterbiBlock(k.toString, s"u_vm${k - 1}", "u_words", L,
        unkFallback = false) + ",\n" +
        costBlock(k.toString, s"u_voc$k")
    }.mkString(",\n")
    s"""u_words AS MATERIALIZED (
       |  SELECT w, CAST(freq AS BIGINT) AS freq FROM (
       |    SELECT w, count(*) AS freq FROM (
       |      SELECT unnest(regexp_split_to_array(
       |        lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')), '\\s+')) AS w
       |      FROM documents) t
       |    WHERE length(w) > 0 GROUP BY w
       |    ORDER BY freq DESC, w ASC LIMIT $wordCap) c),
       |u_sub AS (
       |  SELECT substr(w, CAST(s AS INT), CAST(l AS INT)) AS piece, freq
       |  FROM (SELECT w, freq, s,
       |          unnest(range(1, least($L, length(w) - s + 1) + 1)) AS l
       |        FROM (SELECT w, freq, unnest(range(1, length(w) + 1)) AS s
       |              FROM u_words) a) b),
       |u_subcnt AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM u_sub GROUP BY 1),
       |u_chars AS MATERIALIZED (
       |  SELECT piece, cnt FROM u_subcnt WHERE length(piece) = 1),
       |u_voc0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM u_chars
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM u_subcnt WHERE length(piece) >= 2
       |    ORDER BY cnt DESC, piece ASC LIMIT $seedCap) s),
       |${costBlock("0", "u_voc0")},
       |$em,
       |u_alt AS MATERIALIZED (
       |  SELECT piece, cnt, cost, ${altExpr(L)} AS alt
       |  FROM u_cost$emIters CROSS JOIN u_vm$emIters WHERE length(piece) >= 2),
       |u_keep AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, cnt, cnt * (alt - cost) AS loss FROM u_alt) r
       |  ORDER BY loss DESC, cnt DESC, piece ASC LIMIT $multiKeep),
       |u_vmK AS (
       |  SELECT map(list(piece ORDER BY piece), list(cost ORDER BY piece)) AS m
       |  FROM u_cost$emIters
       |  WHERE length(piece) = 1 OR piece IN (SELECT piece FROM u_keep)),
       |${viterbiBlock("F", "u_vmK", "u_words", L, unkFallback = false)},
       |${costBlock("F", "u_vocF")}""".stripMargin
  }

  /** The q101 oracle. */
  def unigramTrainOracleSql(wordCap: Int = 256, seedMaxLen: Int = 4,
                            seedCap: Int = 48, emIters: Int = 2,
                            multiKeep: Int = 24): String =
    s"""WITH RECURSIVE
       |${trainChain(wordCap, seedMaxLen, seedCap, emIters, multiKeep)}
       |SELECT piece, cnt, cost AS cost_q16 FROM u_costF""".stripMargin

  /** The q101b oracle: the train chain re-derived, then every DISTINCT
    * corpus word Viterbi-encoded (UNK fallback on) and docs reassembled
    * through word→segment maps.
    */
  def unigramEncodeOracleSql(wordCap: Int = 256, seedMaxLen: Int = 4,
                             seedCap: Int = 48, emIters: Int = 2,
                             multiKeep: Int = 24): String = {
    val L = seedMaxLen
    s"""WITH RECURSIVE
       |${trainChain(wordCap, seedMaxLen, seedCap, emIters, multiKeep)},
       |u_vmFin AS (SELECT map(list(piece ORDER BY piece),
       |                       list(cost ORDER BY piece)) AS m FROM u_costF),
       |d_toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(
       |      lower(regexp_replace(coalesce(text, ''), '^\\s+|\\s+$$', '', 'g')), '\\s+'),
       |    t -> length(t) > 0) AS toks
       |  FROM documents),
       |d_words AS (SELECT w, CAST(1 AS BIGINT) AS freq FROM (
       |  SELECT DISTINCT unnest(toks) AS w FROM d_toks) t),
       |${viterbiBlock("D", "u_vmFin", "d_words", L, unkFallback = true)},
       |d_seg AS (
       |  SELECT w, array_to_string(pieces, ' ') AS seg,
       |         CAST(len(pieces) AS BIGINT) AS np
       |  FROM u_walkD WHERE pos = 0),
       |d_map AS (SELECT map(list(w ORDER BY w), list(seg ORDER BY w)) AS sm,
       |                 map(list(w ORDER BY w), list(np ORDER BY w)) AS nm
       |          FROM d_seg)
       |SELECT doc_id,
       |  CAST(COALESCE(list_sum(list_transform(toks,
       |    t -> map_extract(nm, t)[1])), 0) AS BIGINT) AS n_pieces,
       |  COALESCE(array_to_string(list_transform(toks,
       |    t -> map_extract(sm, t)[1]), ' '), '') AS subtext
       |FROM d_toks CROSS JOIN d_map""".stripMargin
  }
}
