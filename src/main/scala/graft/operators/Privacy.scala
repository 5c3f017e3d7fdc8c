package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy release operators — the third stage of the privacy family
  * (q58 redacts PII inside documents; these govern what leaves an
  * aggregate release): q97 k-anonymity suppression (Sweeney 2002) and
  * q98 differentially-private counts via the two-sided geometric
  * mechanism (Ghosh/Roughgarden/Sundararajan, STOC 2009 — the discrete
  * Laplace, the optimal ε-DP mechanism for counts).
  */
object Privacy {

  /** q97: K-ANONYMITY suppression over the customer dimension. The
    * quasi-identifier is (nation, market segment, account-balance
    * kilobucket) — the classic linkage surface: each is harmless
    * alone, jointly they fingerprint. Rows whose QI group has fewer
    * than k members get their QI columns SUPPRESSED (nulled, flagged),
    * so every surviving QI combination is shared by ≥ k people.
    *
    * Scale shape: one aggregate keyed by the fixed-width QI triple
    * (map-side combine → one row per distinct QI), joined back on the
    * same key — the exchange carries QI keys and counts, never
    * payload; AQE broadcasts the group table when the QI space is
    * small. No window over the table.
    *
    * Output: (c_custkey, nationkey_k, segment_k, bal_bucket_k,
    * group_size, suppressed).
    */
  def kAnonymize(customer: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 2, "k-anonymity below 2 is no anonymity")
    val qi = customer.select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nk"),
      col("c_mktsegment").as("seg"),
      // IEEE double divide + floor agree across engines bit-for-bit
      expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("bb"))
    val sizes = qi.groupBy(col("nk"), col("seg"), col("bb"))
      .agg(count(lit(1)).as("group_size"))
    qi.join(sizes, Seq("nk", "seg", "bb"))
      .select(col("c_custkey"),
        when(col("group_size") >= k, col("nk")).as("nationkey_k"),
        when(col("group_size") >= k, col("seg")).as("segment_k"),
        when(col("group_size") >= k, col("bb")).as("bal_bucket_k"),
        col("group_size"),
        (col("group_size") < k).as("suppressed"))
  }

  /** q98: ε-DP NOISED COUNTS per (source, lang) — the corpus-card
    * release a privacy-bound pipeline publishes instead of q88's exact
    * composition. Mechanism: two-sided geometric noise z = g₁ − g₂
    * with g_i iid Geometric(1/2) — the difference of two geometrics IS
    * the discrete Laplace P(z=k) ∝ α^|k| at α = 1/2, i.e. ε = ln 2 per
    * count (sensitivity 1).
    *
    * Sampling is SEEDED AND REPLAYABLE: `seed` salts the group-key
    * hash, which then runs through the q25 universal family (fresh
    * indices 240/241) to two uniform draws u ∈ [1, 2¹⁶−1], and
    * g = 16 − bitlength(u) is exactly Geometric(1/2) truncated at 15
    * (P(g=k) = 2^-(k+1); the 2⁻¹⁶ tail mass folds into g=15 —
    * documented truncation, ~10⁻⁵ distortion). bitlength =
    * length(bin(u)) in BOTH engines, so the whole draw replays in SQL.
    * Negative releases clip to 0 — post-processing, DP-safe.
    *
    * SECRECY CONTRACT (r13, the Kerckhoffs point from the r12 review):
    * the ε = ln 2 guarantee holds only while the SEED IS SECRET — the
    * draw is a deterministic function of (seed, group key), so an
    * adversary who learns the seed (e.g. by reading a pinned test
    * seed out of this repo) computes z and inverts the exact count.
    * A production release draws `seed` from a run-secret source and
    * stores it with the release audit record, never beside the data;
    * the PINNED seed in `SparkEntry`/tests exists so the DuckDB oracle
    * can replay the draw — those runs are a deterministic replayable
    * SIMULATION of the mechanism, not a private release. Distribution
    * properties (P(z=0) ≈ 1/3, E|z| = 4/3, clip-at-zero) hold for
    * every seed; only the release VALUES move (spec-pinned: two seeds
    * disagree on some group while both pass the distribution gates).
    *
    * Scale shape: one map-side-combined count aggregate; the noise is
    * a pure map on the S×L group frame. Output: (source, lang,
    * n_noised) — the exact count never leaves the operator.
    */
  def dpCounts(documents: DataFrame, seed: Long = 0L): DataFrame = {
    import graft.functions.ReplayableHash.{a, b, P}
    val g = documents.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val s = graft.functions.VectorFunctions.poly_hash(
      concat(lit(s"q98:$seed:"), col("source"), lit(":"), col("lang")))
    def draw(i: Int) = ((lit(a(i)) * s + lit(b(i))) % lit(P)) % lit(65535L) + lit(1L)
    def geo(u: org.apache.spark.sql.Column) = lit(16L) - length(bin(u))
    g.select(col("source"), col("lang"),
        greatest(col("n") + geo(draw(240)) - geo(draw(241)), lit(0L)).as("n_noised"))
  }
}
