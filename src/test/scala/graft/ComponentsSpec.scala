package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random

/** Connected-components labeling (q42): the pairs→groups step of
  * semantic dedup. Value-level gate is the DuckDB recursive-CTE
  * oracle; these pin the algorithm against a sequential union-find on
  * adversarial shapes (chains, stars, singletons, random graphs).
  */
class ComponentsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Components

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)],
                  maxIters: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Components.minLabel(nodes.toDF("id"), pairs.toDF("id_a", "id_b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("chains, stars, and singletons label to the component minimum") {
    // chain 1-2-3-4, star 10-{11,12,13}, singleton 99
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 99L)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (10L, 13L))
    val got = run(nodes, pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 99L -> 99L))
  }

  test("a long chain converges within the pointer-jumping bound") {
    // diameter 63: plain propagation needs 63 rounds, jumping ~log
    val nodes = (0L to 63L)
    val pairs = (0L until 63L).map(i => (i, i + 1))
    val got = run(nodes, pairs, maxIters = 10)
    assert(got.values.toSet == Set(0L))
  }

  test("random graphs match a sequential union-find") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nodes = (0 until n).map(_.toLong)
      val pairs = Seq.fill(rnd.nextInt(n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      assert(run(nodes, pairs) == unionFind(nodes, pairs), s"trial $trial")
    }
  }

  test("q42 dedup groups: reps are self-kept minima, groups cover near-dup pairs") {
    import graft.sources.Tables
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val out = Components.dedupGroups(emb)
    assert(out.count() == emb.count())
    // keep flag is exactly "I am my own representative"
    assert(out.filter((col("vec_id") === col("group_rep")) =!=
      (col("keep") === 1L)).count() == 0)
    // the representative is a member of its own group and minimal in it
    val viol = out.as("a").join(out.as("b"),
        col("a.group_rep") === col("b.vec_id"))
      .filter(col("b.group_rep") =!= col("a.group_rep") ||
        col("b.vec_id") > col("a.vec_id"))
    assert(viol.count() == 0)
    // every near-dup pair landed in one group
    val pairs = Similarity.embeddingDedup(emb)
    val crossGroup = pairs
      .join(out.select(col("vec_id").as("id_a"), col("group_rep").as("ga")), Seq("id_a"))
      .join(out.select(col("vec_id").as("id_b"), col("group_rep").as("gb")), Seq("id_b"))
      .filter(col("ga") =!= col("gb"))
    assert(crossGroup.count() == 0)
  }

  test("q64 semdedup: one keeper per component, cluster-local comps, keeper is the outlier") {
    import graft.sources.Tables
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val out = Components.semDedup(emb).localCheckpoint(true)
    assert(out.count() == emb.count())
    // exactly one keep per component
    assert(out.groupBy(col("comp")).agg(sum(col("keep")).as("k"))
      .filter(col("k") =!= 1L).count() == 0)
    // components never cross a cluster boundary (pairs join on cluster)
    assert(out.groupBy(col("comp")).agg(countDistinct(col("cluster")).as("c"))
      .filter(col("c") =!= 1L).count() == 0)
    // comp label is the minimum member id (and therefore a member)
    assert(out.groupBy(col("comp")).agg(min(col("vec_id")).as("m"))
      .filter(col("comp") =!= col("m")).count() == 0)
    // keep-the-outlier: the keeper's centroid distance is its
    // component's max — cross-checked against an independent q60
    // refit (same seeds, same integer Lloyd → identical d2)
    val d2 = Similarity.kmeansAssign(emb, k = 8, iters = 3)
      .select(col("vec_id"), col("d2"))
    val j = out.join(d2, Seq("vec_id")).localCheckpoint(true)
    val mx = j.groupBy(col("comp")).agg(max(col("d2")).as("mx"))
    assert(j.filter(col("keep") === 1L).join(mx, Seq("comp"))
      .filter(col("d2") =!= col("mx")).count() == 0)
    // empty corpus degrades to the empty typed frame
    val empty = Components.semDedup(emb.filter(lit(false)))
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("vec_id", "cluster", "comp", "keep"))
  }

  test("q42b LSH groups refine the exact groups with recall >= 0.9") {
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Components.dedupGroups(emb)
      .select(col("vec_id"), col("group_rep").as("exact_rep"))
    val lsh = Components.dedupGroupsLsh(emb)
      .select(col("vec_id"), col("group_rep").as("lsh_rep"))
    val joined = exact.join(lsh, Seq("vec_id")).localCheckpoint(true)

    // REFINEMENT (deterministic, not statistical): every LSH pair is an
    // exact-cosine-verified true pair, so an LSH group can never span
    // two exact groups — zero rows may share an lsh_rep across
    // different exact_reps
    val merges = joined.as("a").join(joined.as("b"),
        col("a.lsh_rep") === col("b.lsh_rep") &&
        col("a.exact_rep") =!= col("b.exact_rep"))
    assert(merges.count() == 0, "LSH groups must never merge across exact groups")

    // GROUP RECALL: of the rows the exact pass dedups away (members
    // that are not their group's representative), >= 0.9 must still be
    // grouped with their exact representative under LSH — i.e. the LSH
    // pass makes the same keep/drop call
    val members = joined.filter(col("vec_id") =!= col("exact_rep"))
    val total = members.count()
    val correct = members.as("m").join(
        joined.select(col("vec_id").as("exact_rep"),
          col("lsh_rep").as("rep_lsh_rep")), Seq("exact_rep"))
      .filter(col("lsh_rep") === col("rep_lsh_rep"))
      .count()
    assert(total > 0, "corpus has near-dup members to measure recall on")
    val recall = correct.toDouble / total
    info(f"q42b group recall: $correct/$total = $recall%.3f")
    assert(recall >= 0.9, f"group recall $recall%.3f < 0.9")
  }

  test("q80 leakage split: near-dup pairs never straddle splits; planted chain shares one split; deterministic") {
    import spark.implicits._
    import graft.sources.Tables
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // plant a near-dup CHAIN across three docs: clone two corpus texts
    // and a lightly-perturbed third, at fresh ids — they must all land
    // in ONE component and ONE split
    val donor = base.filter(col("doc_id") === 0L).head().getString(1)
    val planted = Seq(
      (900001L, donor),
      (900002L, donor + " extra tail words here"),
      (900003L, donor)).toDF("doc_id", "text")
    val docs = base.unionAll(planted)
    val out = Components.leakageSplit(docs).localCheckpoint(true)
    assert(out.count() == docs.count(), "one decision per doc")
    // THE invariant: every verified near-dup pair is split-consistent
    val pairs = graft.operators.Dedup.minHashPairs(docs)
      .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    assert(pairs.count() > 0, "corpus+planting must yield near-dup pairs")
    val leak = pairs
      .join(out.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(out.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(leak.count() == 0, "near-dup pair crossed a split boundary")
    // the planted chain: one component (min member = the donor's
    // component), one split
    val ch = out.filter(col("doc_id").isin(0L, 900001L, 900002L, 900003L)).collect()
    assert(ch.map(_.getAs[Long]("component")).distinct.length == 1)
    assert(ch.map(_.getAs[String]("split")).distinct.length == 1)
    // myriad bounds respected and all three splits materialize at the
    // default 8000/1000/1000 on ~500 components
    val bySplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"missing split: $bySplit")
    val n = out.count().toDouble
    assert(bySplit("train") / n > 0.6, s"train share degenerate: $bySplit")
    assert(bySplit("val") + bySplit("test") > 0, s"eval empty: $bySplit")
    // pure function of content: repartitioning changes nothing
    val a = out.orderBy("doc_id").collect().toSeq
    val b = Components.leakageSplit(docs.repartition(7, col("doc_id")))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
