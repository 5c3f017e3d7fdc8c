package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Cache key for per-dataset sizing statistics (Similarity.nCache,
  * Analytics.occCache).
  *
  * `analyzed.canonicalized.toString` alone is NOT a dataset identity:
  * canonicalization strips expression ids AND the relation's file
  * listing, so two reads of DIFFERENT parquet directories with the
  * same schema render byte-identically (verified on Spark 4.1:
  * `Project [none#0L]` for two distinct paths). Keyed that way, a
  * sizing cache returns the FIRST dataset's stats for every
  * same-shaped dataset in the session — exactly how r6's BenchScale
  * burst corpus inherited the uniform corpus's (maxOcc, nErr) and
  * selected the window-wide q44 plan on a one-bin burst (measured
  * work exponent ~2.0 vs the micro-bin path's ~1.4).
  *
  * The key therefore prepends each leaf's DATA identity:
  *  - file-backed relations: the root paths of the file index PLUS the
  *    datasource read options (sorted) — two reads of one directory
  *    that differ only in `pathGlobFilter` / `modifiedAfter` /
  *    `recursiveFileLookup` are different datasets and must not share
  *    an entry;
  *  - any other leaf (LocalRelation, streaming sources): the leaf
  *    object's identity hash. Fresh object per construction ⇒ such
  *    plans never share a cache entry — a deliberate trade: local/test
  *    data gets no caching rather than risking cross-dataset reuse.
  */
private[graft] object SizingKey {
  def apply(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed
    val leaves = plan.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.mkString(",") + "?" +
            fs.options.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
        case other => other.getClass.getName + "@" + System.identityHashCode(other)
      }
      case leaf => leaf.getClass.getName + "@" + System.identityHashCode(leaf)
    }
    leaves.mkString(";") + "#" + plan.canonicalized.toString
  }
}

/** Session-scoped sizing-stat cache — the one WeakHashMap-of-
  * ConcurrentHashMap pattern shared by Similarity.nCache and
  * Analytics.occCache (previously duplicated line-for-line; a fix
  * applied to one copy and missed in the other reintroduces the
  * cross-dataset-stats bug class, so there is exactly one copy now).
  *
  * WEAK session key: a retired session's entry map is GC-reclaimed
  * with it (values are plain strings/longs/tuples — nothing pins the
  * session). Bounded per session: the map only ever holds cheap
  * sizing stats, so dropping it on overflow costs one re-measure,
  * never correctness.
  */
private[graft] final class SessionCache[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, V]]()

  def getOrCompute(session: SparkSession, key: String)(compute: => V): V = {
    val per = bySession.synchronized {
      var m = bySession.get(session)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        bySession.put(session, m)
      }
      m
    }
    if (per.size > 256) per.clear()
    per.computeIfAbsent(key, _ => compute)
  }
}
