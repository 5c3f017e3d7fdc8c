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

  /** Deterministic fake feature vector from a payload — the stub
    * stand-in for an image/audio embedding model. Real plumbing: the
    * output is a dense `Array[Float]` column ready for the Similarity
    * operators (knn/embedding-dedup run on it unchanged).
    */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 0x100000001b3L; i += 1 }
    var d = 0
    while (d < dim) {
      val z = graft.functions.RhpPlanes.mix(h + d)
      out(d) = (z.toDouble / Long.MaxValue.toDouble).toFloat
      d += 1
    }
    out
  }

  case class MediaFeatures(doc_id: Long, features: Array[Float])
  case class ResizedMedia(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFrames(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Feature extraction over payload batches (stub model, real
    * mapPartitions plumbing + schema): binary column in, float-vector
    * column out — feeds straight into Similarity.knnBruteForce etc.
    */
  def extractFeatures(documents: DataFrame, dim: Int = 64,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val withPayload = documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[MediaFeatures]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, p) =>
        MediaFeatures(id, featureStub(if (p == null) Array.emptyByteArray else p, dim))
      }))
  }

  /** Resize stub: deterministic truncation standing in for a pixel
    * resample — output payload is a prefix of the input (a real codec
    * would re-encode), with the claimed output dims carried beside it.
    */
  def resize(documents: DataFrame, width: Int = 64, height: Int = 48,
             batchSize: Int = 64): Dataset[ResizedMedia] = {
    val withPayload = documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[ResizedMedia]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, p) =>
        val src = if (p == null) Array.emptyByteArray else p
        ResizedMedia(id, src.take(math.min(src.length, width * height / 8)), width, height)
      }))
  }

  /** Frame sampling stub: split the payload into `nFrames` even chunks
    * (a real video codec would decode + sample keyframes). 1→N rows,
    * the explode-shaped transform of the media pipeline.
    */
  def sampleFrames(documents: DataFrame, nFrames: Int = 4,
                   batchSize: Int = 64): Dataset[MediaFrames] = {
    val withPayload = documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[MediaFrames]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, p) =>
        val src = if (p == null) Array.emptyByteArray else p
        val step = math.max(1, src.length / nFrames)
        (0 until nFrames).iterator.map { f =>
          MediaFrames(id, f, src.slice(f * step, math.min(src.length, f * step + step)))
        }
      }))
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
