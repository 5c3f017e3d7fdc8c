package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * near-duplicate PAIRS (q30/q30b/q25 output) into dedup GROUPS with a
  * canonical representative, i.e. the actual keep/drop decision a
  * training-corpus pipeline executes. Reference analog: none (the
  * reference stops at per-key aggregation); this is the standard
  * map-reduce CC problem (Kiveris et al., "Connected Components in
  * MapReduce and Beyond").
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING —
  * each round a node takes the minimum label among itself and its
  * neighbors (one edge-join + aggregation), then compresses paths by
  * adopting its label's label (one self-join). Neighbor propagation
  * alone converges in O(diameter) rounds; the jump makes label trees
  * logarithmic, so rounds ≈ O(log diameter) — and near-dup clusters
  * have tiny diameters to begin with. Each round's frame is
  * localCheckpoint'ed: lineage stays flat (no exponential plan
  * growth), blocks die with the loop.
  *
  * Scale: every round is one shuffle of |E| (neighbor min) plus one of
  * |V| (jump + convergence count). No driver-side graph state — only
  * the per-round `changed` COUNT comes back to the driver. At 100 TB,
  * rounds are bounded by log(largest component diameter), not
  * component count.
  */
object Components {

  /** Label every node of `nodes` (single column `id`) with the MINIMUM
    * node id reachable through `pairs` (columns `id_a`, `id_b`).
    * Output: (id, label). Throws if not converged in `maxIters`
    * rounds (pathological diameter — raise the bound explicitly
    * rather than returning silently-wrong labels).
    */
  def minLabel(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label").as("vlabel")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("vlabel")).as("nlabel"))
      // carry the previous label through the round so the convergence
      // count rides the checkpoint job itself (an observed metric over
      // the materialization), not a separate count() job
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jump: adopt the label OF my label (labels are node ids,
      // so the lookup is a self-join); compresses chains exponentially
      val obs = Observation(s"cc_round_$it")
      val jumped = stepped
        .join(stepped.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), col("old"), coalesce(col("ll"), col("label")).as("label"))
        .observe(obs, coalesce(sum((col("label") =!= col("old")).cast("long")),
          lit(0L)).as("changed"))
        .localCheckpoint(true)
      changed = obs.get("changed").asInstanceOf[Long]
      labels = jumped.select(col("id"), col("label"))
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds; " +
          "raise maxIters for graphs with pathological diameter")
    labels
  }

  /** Pair frame (id_a, id_b) → one row per vector of `embeddings`:
    * component representative (minimum vec_id reachable through the
    * pairs) and the keep flag — keep exactly the representative of
    * each group, drop the rest.
    */
  private def groupsFromPairs(embeddings: DataFrame, pairs: DataFrame): DataFrame =
    minLabel(embeddings.select(col("vec_id").as("id")), pairs)
      .select(col("id").as("vec_id"), col("label").as("group_rep"),
        (col("id") === col("label")).cast("long").as("keep"))

  /** q42: semantic dedup groups over the EXACT near-dup pairs (q30).
    * One row per vector: its component representative (minimum vec_id
    * reachable through cosine ≥ tau pairs) and the keep flag. The
    * entire chain (pairs + closure) replays in the DuckDB oracle as a
    * recursive CTE, so the distributed iteration is hash-checked
    * against a sequential ground truth. Pair enumeration is Θ(N²)
    * comparisons by declared design (see embeddingDedup) — the exact
    * baseline; the 100 TB path is dedupGroupsLsh below.
    */
  def dedupGroups(embeddings: DataFrame, tau: Double = 0.35): DataFrame =
    groupsFromPairs(embeddings, Similarity.embeddingDedup(embeddings, tau))

  /** q42b: the SUB-QUADRATIC dedup-groups path — identical closure,
    * but the pair graph comes from the banded-LSH candidate generator
    * (q30b) instead of the exact Θ(N²) enumeration. Semantics are
    * honestly approximate at the PAIR level (a qualifying pair whose
    * signatures never share a band is missed, so a group may split),
    * yet the pipeline stays fully deterministic: signatures, bands and
    * the exact-cosine verify are all SQL-replayable integer/IEEE math,
    * so the output is rows+schema+hash oracle-checked like q42 — the
    * DuckDB oracle runs the same LSH pair CTE under the same recursive
    * closure. Group-level recall vs the exact q42 groups is asserted
    * separately in ComponentsSpec (pair recall ≥ 0.8 gives group
    * agreement far higher — a group needs only ONE retained edge per
    * member to stay connected).
    *
    * Scale: candidates are Σ_buckets |bucket|² per band with occupancy
    * held ~32 by auto-sized band width — ~nBands·32·N, and the closure
    * is O(log diameter) rounds of |E|+|V| shuffles. Nothing in the
    * chain is quadratic; this is the variant a 100 TB corpus runs.
    */
  def dedupGroupsLsh(embeddings: DataFrame, tau: Double = 0.35): DataFrame =
    groupsFromPairs(embeddings, Similarity.embeddingDedupLsh(embeddings, tau))

  /** q80: LEAKAGE-FREE TRAIN/VAL/TEST SPLIT — the evaluation-hygiene
    * step a naive per-document hash split gets wrong: near-duplicate
    * documents falling on opposite sides of a split leak training
    * content into eval (the reason decontamination papers report
    * split-level dedup; cf. Lee et al. 2021 §5's eval-overlap
    * findings). The unit of assignment must be the near-dup
    * COMPONENT, not the document: build the q25 banded-MinHash pair
    * graph (exact-Jaccard verified at `tau`), close it with the q42
    * pointer-jumping minLabel, then draw the split from a universal
    * hash (fresh index 233) of the COMPONENT label — every member of
    * a component lands in the same split by construction, and
    * singleton docs get an unbiased independent draw. Myriad-integer
    * split bounds (default 8000/1000/1000), the q37 no-FP discipline.
    *
    * Scale: candidate pairs are the occupancy-bounded banded set
    * (never all-pairs), the closure is O(log diameter) rounds, the
    * split itself a pure map — every stage is the 100 TB-proven
    * machinery it reuses. Output: (doc_id, component, bucket, split).
    */
  def leakageSplit(documents: DataFrame, numPerm: Int = 32, bands: Int = 8,
                   shingleN: Int = 3, tau: Double = 0.5,
                   valMyriad: Int = 1000, testMyriad: Int = 1000): DataFrame = {
    require(valMyriad >= 0 && testMyriad >= 0 && valMyriad + testMyriad <= 10000,
      "split bounds are parts-per-myriad")
    val pairs = Dedup.minHashPairs(documents, numPerm, bands, shingleN)
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"))
    val labels = minLabel(documents.select(col("doc_id").as("id")), pairs)
    val P = graft.functions.ReplayableHash.P
    val ha = graft.functions.ReplayableHash.a(233)
    val hb = graft.functions.ReplayableHash.b(233)
    val s = graft.functions.VectorFunctions.poly_hash(
      concat(lit("split:"), col("component").cast("string")))
    val trainBound = 10000L - valMyriad - testMyriad
    val valBound = 10000L - testMyriad
    labels.select(col("id").as("doc_id"), col("label").as("component"))
      .withColumn("bucket", (lit(ha) * s + lit(hb)) % lit(P) % lit(10000L))
      .withColumn("split",
        when(col("bucket") < lit(trainBound), lit("train"))
          .when(col("bucket") < lit(valBound), lit("val"))
          .otherwise(lit("test")))
  }

  /** The q80 oracle: the q25 pair CTEs (verbatim through `verified`),
    * the q42 recursive closure, and the identical component-keyed
    * split draw.
    */
  def leakageSplitOracleSql(tau: Double = 0.5, valMyriad: Int = 1000,
                            testMyriad: Int = 1000): String = {
    val P = graft.functions.ReplayableHash.P
    val ha = graft.functions.ReplayableHash.a(233)
    val hb = graft.functions.ReplayableHash.b(233)
    val trainBound = 10000L - valMyriad - testMyriad
    val valBound = 10000L - testMyriad
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')), '\\s+') AS toks
       |  FROM documents),
       |shs AS (
       |  SELECT DISTINCT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(1, length(sh)+1),
       |             i -> CAST(unicode(substring(sh, CAST(i AS INT), 1)) AS BIGINT))),
       |           (h, c) -> (h * 31 + c) % 1000000007) AS s
       |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
       |          range(1, greatest(len(toks) - 2, 1) + 1),
       |          i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)), ' ')))) AS sh
       |        FROM toks) x),
       |sig AS (
       |  SELECT doc_id, i,
       |         min((((1103515245*(2*i+1) + 12345) % 2147483648) * s
       |              + ((1103515245*(2*i+2) + 12345) % 2147483648)) % 2147483647) AS m
       |  FROM shs, range(0, 32) t(i)
       |  GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, i // 4 AS band_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), list(m ORDER BY i)),
       |           (acc, x) -> (acc * 131 + x) % 1000000007) AS band_sig
       |  FROM sig GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shs GROUP BY 1),
       |common AS (
       |  SELECT id_a, id_b, count(*) AS n_common
       |  FROM cand
       |  JOIN shs pa ON pa.doc_id = id_a
       |  JOIN shs pb ON pb.doc_id = id_b AND pa.s = pb.s
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
       |           / CAST(sa.n_sh + sb.n_sh - COALESCE(cm.n_common, 0) AS DOUBLE) AS jaccard
       |  FROM cand c
       |  LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM verified WHERE jaccard >= $tau
       |  UNION ALL
       |  SELECT id_b AS u, id_a AS v FROM verified WHERE jaccard >= $tau),
       |rec AS (
       |  SELECT doc_id AS id, doc_id AS label FROM documents
       |  UNION
       |  SELECT edges.v AS id, rec.label FROM rec JOIN edges ON edges.u = rec.id),
       |comp AS (SELECT id AS doc_id, min(label) AS component FROM rec GROUP BY id),
       |draw AS (
       |  SELECT doc_id, component,
       |         ($ha * list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(1, length(kk)+1),
       |              i -> CAST(unicode(substring(kk, CAST(i AS INT), 1)) AS BIGINT))),
       |            (h, c) -> (h * 31 + c) % 1000000007) + $hb) % $P % 10000 AS bucket
       |  FROM (SELECT doc_id, component, 'split:' || CAST(component AS VARCHAR) AS kk
       |        FROM comp) t)
       |SELECT doc_id, component, bucket,
       |       CASE WHEN bucket < $trainBound THEN 'train'
       |            WHEN bucket < $valBound THEN 'val'
       |            ELSE 'test' END AS split
       |FROM draw""".stripMargin
  }

  /** q64: SEMANTIC dedup à la SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540) — cluster the corpus, enumerate near-dup pairs
    * only WITHIN clusters, close them into components, and keep per
    * component the member FARTHEST from its cluster centroid (the
    * paper's keep-the-outlier rule: the redundant copies near the
    * centroid carry the least marginal information), ties to the
    * smallest vec_id. Everything runs in the q60 integer domain
    * (quantize `floor(v·2²⁰+0.5)+2²⁰`, integer Lloyd, L2DistExpr), so
    * unlike the cosine-based q42 family the WHOLE pipeline —
    * codebook, assignment, pair predicate, closure, keep rule — is
    * hash-exact against a DuckDB replay (semDedupOracleSql).
    *
    * Relation to q42: q42's components span the whole corpus (exact
    * or LSH pair graph); SemDeDup's are cluster-local by construction
    * — pairs join on cluster id, so a component can never cross a
    * cluster boundary and each component has a well-defined centroid
    * distance order. That locality is also the scale story: pair
    * enumeration is Σ_c |c|² ≈ N²/k comparisons (k≈√N → O(N^1.5),
    * the IVF sizing), never all-pairs, and the closure reuses
    * minLabel's O(log diameter) pointer-jumping rounds. The
    * registered instance pins k=8, iters=3 (the unrolled-CTE
    * checkability contract, like q60/q63).
    *
    * tau2 is an integer threshold on the quantized scale (d2_int ≈
    * 2⁴⁰·Σ(Δv)²); the default sits at the ~1% left-tail of the
    * synthetic corpus's pair distances (probed: min 1.07e12, p1
    * 1.56e12, median 2.2e12), the same "demo threshold" role as
    * q30's cosine 0.35.
    *
    * Output: (vec_id, cluster, comp, keep) — comp = min vec_id
    * reachable, keep = 1 iff farthest-from-centroid in its component;
    * singletons keep themselves.
    */
  def semDedup(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
               tau2: Long = 1500000000000L): DataFrame = {
    Similarity.kmeansFit(embeddings, k, iters) match {
      case None =>
        embeddings.sparkSession.createDataFrame(
          embeddings.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "vec_id BIGINT, cluster BIGINT, comp BIGINT, keep BIGINT"))
      case Some((cents, q)) =>
        // assigned reused three ways (both pair sides + the keep
        // join), so checkpoint once — the §8 persist rule
        val assigned = Similarity.kmeansAssigned(q, cents)
          .select(col("vec_id"), col("q"),
            col("best.cid").cast("long").as("cluster"), col("best.d2").as("d2"))
          .localCheckpoint(true)
        val pairs = assigned.select(col("cluster"), col("vec_id").as("id_a"), col("q").as("qa"))
          .join(assigned.select(col("cluster"), col("vec_id").as("id_b"), col("q").as("qb")),
            Seq("cluster"))
          .filter(col("id_a") < col("id_b"))
          .filter(graft.functions.VectorFunctions.l2_dist(col("qa"), col("qb")) <= lit(tau2))
          .select(col("id_a"), col("id_b"))
        val comps = minLabel(assigned.select(col("vec_id").as("id")), pairs)
          .select(col("id").as("vec_id"), col("label").as("comp"))
        val labeled = assigned.select(col("vec_id"), col("cluster"), col("d2"))
          .join(comps, Seq("vec_id"))
        // keeper per component via ONE struct-max aggregate (max d2,
        // tie min id ↔ max -id) + an equi-join back — no window sort
        val kept = labeled.groupBy(col("comp"))
          .agg(max(struct(col("d2").as("d2"), (-col("vec_id")).as("nid"))).as("w"))
        labeled.join(kept, Seq("comp"))
          .select(col("vec_id"), col("cluster"), col("comp"),
            (col("d2") === col("w.d2") && col("vec_id") === -col("w.nid"))
              .cast("long").as("keep"))
    }
  }

  /** The q64 oracle: the q60 centroid/assignment CTE chain (shared
    * generators) feeding a within-cluster pair predicate, the q42
    * recursive-CTE closure, and the keep rule as row_number
    * (d2 DESC, vec_id ASC) ↔ Spark's struct-max. One integer domain
    * end to end — no FP anywhere.
    */
  def semDedupOracleSql(k: Int = 8, iters: Int = 3,
                        tau2: Long = 1500000000000L): String = {
    val it = iters + 1
    val d2fold =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |             list_transform(range(1, len(a.q) + 1),
        |               i -> (a.q[CAST(i AS INT)] - b.q[CAST(i AS INT)])
        |                  * (a.q[CAST(i AS INT)] - b.q[CAST(i AS INT)]))),
        |             (acc, x) -> acc + x)""".stripMargin
    // the shared prefix is non-recursive; RECURSIVE must sit on the
    // single WITH that also introduces the closure CTE below
    val prefix = Similarity.kmeansCentroidCtes(k, iters)
      .replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$prefix,
       |${Similarity.kmeansAssignCte(it, s"cent$iters")},
       |sdpairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM a$it a JOIN a$it b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE $d2fold <= $tau2),
       |sdedges AS (
       |  SELECT id_a AS u, id_b AS v FROM sdpairs
       |  UNION ALL
       |  SELECT id_b AS u, id_a AS v FROM sdpairs),
       |sdrec AS (
       |  SELECT vec_id AS id, vec_id AS label FROM a$it
       |  UNION
       |  SELECT sdedges.v AS id, sdrec.label FROM sdrec JOIN sdedges ON sdedges.u = sdrec.id),
       |sdcomp AS (SELECT id AS vec_id, min(label) AS comp FROM sdrec GROUP BY id),
       |sdranked AS (
       |  SELECT s.vec_id, s.cid, c.comp,
       |         row_number() OVER (PARTITION BY c.comp
       |           ORDER BY s.d2 DESC, s.vec_id ASC) AS rn
       |  FROM a$it s JOIN sdcomp c USING (vec_id))
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, comp,
       |       CAST(rn = 1 AS BIGINT) AS keep
       |FROM sdranked""".stripMargin
  }
}
