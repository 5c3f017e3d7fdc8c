package graft.tools

import org.apache.spark.sql.SparkSession

/** STEAL-PROOF PERFORMANCE PINS (r13 verdict task #1) — the committed
  * cross-round perf reference that no longer waits for a quiet FULL
  * bench window (none arrived in two rounds on this shared-hypervisor
  * host). Instead of one ~150 s artifact needing ~0 steal for its
  * whole duration, each adjudication-critical query gets its OWN pin:
  * a fresh-JVM isolated probe (warmup + 6 timed passes under the
  * exact Bench session config), each pass recording wall, process
  * CPU, and the pass-local hypervisor steal (/proc/stat field 8
  * delta over the pass). A pass QUALIFIES when its steal_cpus < 0.1;
  * the pin is the min qualifying wall. Short passes land inside
  * quiet sub-windows that a 150 s run never sees whole.
  *
  * Invocation (one JVM per call — `run / fork := true` makes every
  * `sbt runMain` a fresh JVM, so JIT/block-manager state never leaks
  * between queries):
  * {{{
  *   sbt "runMain graft.tools.BenchPins q27_ngram_jaccard q55_pagerank"
  * }}}
  * MERGES into BENCH_PINS.json (env SPARK_GRAFT_PINS to relocate):
  * an existing pin is replaced only by a lower qualifying wall, so
  * repeated attempts across a round monotonically improve the
  * artifact and a noisy attempt can never degrade it. Per query the
  * record keeps the qualifying pin (wall/cpu/steal of that pass) plus
  * `wall_min_any` (best pass regardless of steal, for context) and
  * the pass count that has qualified so far.
  *
  * tools/collect_pins.sh drives the sweep: probes ambient steal
  * first, runs one query per JVM, loops until every pinned query has
  * a qualifying reading.
  */
object BenchPins {
  /** Every query whose (contended) bench wall has exceeded ~1.8 s —
    * the r14 verdict's coverage contract: a query fast enough to hide
    * inside scheduler noise doesn't need a pin; everything slower gets
    * its own steal-gated fresh-JVM reading — plus the r15 additions.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q27_ngram_jaccard", "q42b_dedup_groups_lsh", "q53_curate",
    "q53b_curate_srcquota", "q54_triangle_count", "q55_pagerank",
    "q57_communities", "q64_semdedup", "q71_substring_dedup",
    "q90_source_quota", "q94_mmr", "q99_hybrid_rrf",
    "q102_rag_search", "q103_curate_incremental", "q103b_curate_frozen",
    "q10_pickup_pipeline", "q11_pricing_summary", "q13_regional_revenue",
    "q25_dedup_minhash", "q26_dedup_simhash", "q28_knn_bruteforce",
    "q29b_knn_lsh_int", "q39_repetition_stats", "q42_dedup_groups",
    "q43_video_meta", "q49_decontaminate_fuzzy", "q63_knn_ivf_exact",
    "q65_pq_codes", "q66_ivfadc", "q74_ccnet_buckets",
    "q80_leakage_split", "q81_contamination_report",
    "q84_memorization_risk", "q89_copurchase_topk",
    "q104_kn_trigram", "q104b_kn_fivegram", "q105_url_filter",
    "q67b_bpe_bytes_train", "q68b_bpe_bytes_encode")

  private def stealJiffies(): Long = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val cpu = src.getLines().find(_.startsWith("cpu ")).get.trim.split("\\s+")
      if (cpu.length > 8) cpu(8).toLong else -1L
    } finally src.close()
  } catch { case scala.util.control.NonFatal(_) => -1L }

  case class Pin(wall: Double, cpu: Double, steal: Double,
                 wallMinAny: Double, qualPasses: Int, utcMs: Long)

  private def readPins(path: java.io.File): Map[String, Pin] = {
    if (!path.exists()) return Map.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(path.toPath))
    val qn = root.get("queries")
    if (qn == null) return Map.empty
    val b = Map.newBuilder[String, Pin]
    val it = qn.fields()
    while (it.hasNext) {
      val e = it.next(); val v = e.getValue
      b += e.getKey -> Pin(v.get("wall").asDouble(), v.get("cpu").asDouble(),
        v.get("steal_cpus").asDouble(), v.get("wall_min_any").asDouble(),
        v.get("qual_passes").asInt(), v.get("utc_ms").asLong())
    }
    b.result()
  }

  private def writePins(path: java.io.File, pins: Map[String, Pin]): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("gate_steal_cpus", 0.1)
    root.put("passes_per_attempt", 6)
    root.put("sf", sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val qn = root.putObject("queries")
    pins.toSeq.sortBy(_._1).foreach { case (q, p) =>
      val n = qn.putObject(q)
      n.put("wall", math.rint(p.wall * 1000) / 1000)
      n.put("cpu", math.rint(p.cpu * 1000) / 1000)
      n.put("steal_cpus", math.rint(p.steal * 10000) / 10000)
      n.put("wall_min_any", math.rint(p.wallMinAny * 1000) / 1000)
      n.put("qual_passes", p.qualPasses)
      n.put("utc_ms", p.utcMs)
    }
    val w = new java.io.PrintWriter(path)
    try w.println(om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    val passes = sys.env.get("SPARK_GRAFT_PIN_PASSES").map(_.toInt).getOrElse(6)
    val pinsPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PINS", "BENCH_PINS.json"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuNanos: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    for (q <- queries) {
      val fn = graft.SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query '$q'"))
      // warmup (JIT + codegen + parquet footers land here, like Bench);
      // a warmup failure is loud — the timed passes will almost surely
      // fail the same way and be discarded below
      try graft.Bench.force(fn(spark, dir)) catch {
        case t: Throwable =>
          println(s"[pin] $q warmup FAILED: ${t.getClass.getName}: ${t.getMessage}")
      }
      // A pass that THROWS is invalid, never timed: a crashed query
      // returns in milliseconds with ~0 steal, so timing the failure
      // would produce a bogus qualifying pin that the monotone merge
      // ("replaced only by a lower qualifying wall") makes permanent.
      val rows = (1 to passes).map { i =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val s0 = stealJiffies(); val c0 = cpuNanos; val t0 = System.nanoTime()
        val ok = try { graft.Bench.force(fn(spark, dir)); true } catch {
          case t: Throwable =>
            println(s"[pin] $q pass$i FAILED (pass discarded): " +
              s"${t.getClass.getName}: ${t.getMessage}")
            false
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else (cpuNanos - c0) / 1e9
        val s1 = stealJiffies()
        // jiffies are 10 ms: steal seconds = Δ/100; steal_cpus = per wall-second
        val steal = if (s0 < 0 || s1 < 0 || wall <= 0) -1.0
          else (s1 - s0) / 100.0 / wall
        if (ok)
          println(f"[pin] $q pass$i wall=$wall%.3f cpu=$cpu%.3f steal_cpus=$steal%.4f")
        (wall, cpu, steal, ok)
      }
      val valid = rows.filter(_._4)
      val qual = valid.filter(r => r._3 >= 0 && r._3 < 0.1)
      val minAny = if (valid.nonEmpty) valid.map(_._1).min else Double.NaN
      val existing = readPins(pinsPath)
      val updated = qual.sortBy(_._1).headOption match {
        case Some((w, c, s, _)) =>
          val merged = existing.get(q) match {
            case Some(old) if old.wall <= w =>
              old.copy(wallMinAny = math.min(old.wallMinAny, minAny),
                qualPasses = old.qualPasses + qual.size)
            case other =>
              Pin(w, c, s, math.min(minAny,
                other.map(_.wallMinAny).getOrElse(minAny)),
                other.map(_.qualPasses).getOrElse(0) + qual.size,
                System.currentTimeMillis())
          }
          existing.updated(q, merged)
        case None if valid.isEmpty =>
          println(s"[pin] $q: ALL $passes passes failed — nothing recorded")
          existing
        case None =>
          println(f"[pin] $q: NO qualifying pass this attempt " +
            f"(min wall $minAny%.3f, all passes steal >= 0.1)")
          existing.get(q) match {
            case Some(old) =>
              existing.updated(q, old.copy(
                wallMinAny = math.min(old.wallMinAny, minAny)))
            case None => existing
          }
      }
      writePins(pinsPath, updated)
    }
    spark.stop()
    // summary for the driving script: which defaults still lack a pin
    val fin = readPins(pinsPath)
    val missing = DefaultQueries.filterNot(fin.contains)
    println(s"[pin] pinned=${fin.size} missing=${missing.mkString(",")}")
  }
}
