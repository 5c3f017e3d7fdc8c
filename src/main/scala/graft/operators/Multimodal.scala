package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 q31): media payloads ride
  * as opaque `binary` columns with typed metadata beside them — the
  * standard layout for image/audio/video corpora in parquet at scale
  * (blob + struct metadata; decode happens late, in the worker, only
  * for surviving rows).
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload. Everything around it — the binary column, checksum,
  * metadata schema, and the partition-batched decode path
  * (`decodeBatch`, the Scala analog of a Pandas-UDF/mapInPandas batch
  * decode) — is real and tested.
  */
object Multimodal {

  /** q31: attach a binary payload (here: the UTF-8 bytes of `text`,
    * standing in for image bytes) and extract typed metadata with pure
    * column expressions: byte length, md5 checksum, and stub-decoded
    * width/height (deterministic functions of doc metadata, NOT of the
    * codec — clearly fake, exercising the real schema/plumbing).
    */
  def multimodalMeta(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("blob_len"),
        md5(col("payload")).as("blob_md5"),
        // stub decode: fake dims derived deterministically from metadata
        (col("n_chars") % 1024).cast("long").as("width"),
        ((col("doc_id") * 7919) % 768).cast("long").as("height"))

  /** A decoded media record — what a real decoder would emit. */
  case class DecodedMedia(doc_id: Long, blob_len: Long, width: Int, height: Int,
                          n_frames: Int, ok: Boolean)

  /** STUB decoder for one payload. A real build links an image/audio
    * codec here; this deterministic fake keeps the signature and the
    * failure path (`ok = false` on empty payloads) honest.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): DecodedMedia = {
    val ok = payload != null && payload.nonEmpty
    val len = if (ok) payload.length else 0
    DecodedMedia(docId, len.toLong,
      width = if (ok) (len % 1024) else 0,
      height = if (ok) ((docId * 7919) % 768).toInt else 0,
      n_frames = if (ok) 1 + (len % 8) else 0,
      ok = ok)
  }

  /** Partition-batched decode — the Scala analog of `mapInPandas`: each
    * partition's rows stream through the decoder in micro-batches of
    * `batchSize` (a real decoder amortizes codec init / GPU transfer per
    * batch). No shuffle: purely narrow, scales linearly with input.
    */
  def decodeBatch(documents: DataFrame, batchSize: Int = 64): Dataset[DecodedMedia] = {
    val withPayload = documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[DecodedMedia]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real codec would init once
          batch.iterator.map { case (id, payload) => decodeStub(id, payload) }
        }
      }
  }
}
