package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** q87: JSONL source/sink — line-delimited JSON is THE interchange
  * format training corpora ship in (HF datasets, Dolma, RedPajama
  * dumps are jsonl[.gz]), so an engine that can only scan parquet
  * can't ingest a released corpus. Thin by design over Spark's native
  * json datasource (codegen'd Jackson parser, splittable files,
  * predicate-friendly) with the two policies that matter at 100 TB
  * made explicit:
  *
  *  - **Schema is PINNED, never inferred.** `spark.read.json` without
  *    a schema runs a full inference SCAN over the data before the
  *    real read — at corpus scale that silently doubles the job. Every
  *    reader here takes an explicit StructType.
  *  - **Corrupt lines are ATTRIBUTABLE, not fatal and not silent.**
  *    PERMISSIVE mode + `_corrupt_record`: a broken line yields a row
  *    with all schema fields null and the raw line preserved in the
  *    corrupt column (the q70 per-rule-boolean discipline applied to
  *    ingest); callers split good/bad with one filter. A 100 TB crawl
  *    dump ALWAYS has broken lines — FAILFAST would kill the job at
  *    hour nine.
  *
  * Round-trip fidelity: JSON has no type annotations, so the write →
  * read cycle is identity ONLY under a pinned schema on types JSON
  * represents exactly (longs, strings, booleans, arrays thereof) —
  * which the documents/embeddings-shaped tables satisfy. The
  * registered q87 query proves it end-to-end: documents → jsonl →
  * read-back hash-compares against the parquet original (the oracle
  * is the identity SELECT). Null fields are OMITTED on write (JSON
  * convention) and read back as null — the cycle preserves them.
  */
object Jsonl {

  /** Write a frame as JSONL (one JSON object per line). Nulls are
    * omitted per JSON convention; `overwrite` because interchange
    * dumps are replaced, not appended.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-pinned JSONL read with attributable corrupt lines: the
    * result carries the schema's columns plus `_corrupt_record`
    * (null for well-formed lines, the raw line for broken ones).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed rows only (the common path). DROPMALFORMED, not a
    * filter on `_corrupt_record`: Spark ≥ 2.3 disallows queries over
    * raw files whose referenced columns are only the internal corrupt
    * column (it would force a second parse), and the documented
    * workaround — cache the parsed frame first — is a corpus-sized
    * storage bill. When the DROPPED lines must be attributable, use
    * `read` and materialize (localCheckpoint/cache) before splitting
    * on `_corrupt_record`, exactly as the Spark migration guide
    * prescribes.
    */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** The registered q87 round-trip: documents → jsonl under the JVM
    * temp dir → schema-pinned read-back. Hash-compared against the
    * identity SELECT over the parquet original, this proves write and
    * read compose to the identity on the interchange-exact types.
    * The jsonl lands in a per-(sf-dir, Spark app) scratch path —
    * deterministic within a run, overwritten per run, never under the
    * read-only testdata, and DISJOINT across concurrent JVMs (two
    * sessions on the same data dir — e.g. the test suite and a bench —
    * must not overwrite each other's files mid-read; applicationId is
    * unique per SparkContext). floorMod keeps Int.MinValue nonnegative
    * where math.abs would not.
    */
  def roundTripDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_jsonl_${Math.floorMod(dir.hashCode, Int.MaxValue)}_" +
        spark.sparkContext.applicationId).getAbsolutePath
    write(docs, path)
    readClean(spark, path, docs.schema)
  }
}
