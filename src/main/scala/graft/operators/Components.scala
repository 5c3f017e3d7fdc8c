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
}
