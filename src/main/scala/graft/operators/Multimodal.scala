package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 q31): media payloads ride
  * as opaque `binary` columns with typed metadata beside them — the
  * standard layout for image/audio/video corpora in parquet at scale
  * (blob + struct metadata; decode happens late, in the worker, only
  * for surviving rows).
  *
  * The STILL-IMAGE path is REAL: `decodeImage` runs javax.imageio
  * (PNG/JPEG/BMP/GIF readers ship in the JDK — no external dependency)
  * and `encodePng` produces genuine PNG bytes, so q31's width/height
  * come from actual decoded pixels. The AUDIO path is REAL too:
  * `encodeWav`/`decodeAudio` run javax.sound.sampled (java.desktop,
  * also JDK-core) over genuine RIFF/WAVE containers — q41's
  * rate/channels/samples come from the parsed stream. FEATURE
  * EXTRACTION is real as of r10 — a 64-bin color histogram + Sobel
  * edge detector over the decoded raster (q59, hash-exact oracle);
  * a learned embedding model would slot into the same mapPartitions
  * plumbing with the same schema. Byte-slicing `resize`/`sampleFrames`
  * remain for generic non-image binaries; the image paths
  * (`resizeReal`, `sampleKeyframes`) run the actual codec.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // round-trips a temp file, which is both slower and load-sensitive
  // (measured multi-second q31 variance under concurrent I/O). The
  // payloads here are all in-memory byte arrays — cache in heap.
  javax.imageio.ImageIO.setUseCache(false)

  /** A decoded media record — what a real decoder would emit. */
  case class DecodedMedia(doc_id: Long, blob_len: Long, width: Int, height: Int,
                          n_frames: Int, ok: Boolean)

  /** Output row of the q31 metadata pass. */
  case class MultimodalMeta(doc_id: Long, blob_len: Long, blob_md5: String,
                            width: Long, height: Long)

  /** REAL still-image decode via the JDK's ImageIO: dimensions read
    * from the decoded pixel raster. ok=false (zero dims) for null,
    * empty, or undecodable payloads — the honest failure path a media
    * pipeline must carry.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): DecodedMedia = {
    if (payload == null || payload.isEmpty)
      DecodedMedia(docId, 0L, 0, 0, 0, ok = false)
    else {
      // NonFatal, not just IOException: ImageIO plugins throw unchecked
      // errors on some malformed-but-recognized payloads (CMMException
      // on broken ICC profiles, IndexOutOfBounds on truncated headers);
      // a corrupt blob must become an ok=false ROW, never a dead task.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) DecodedMedia(docId, payload.length.toLong, 0, 0, 0, ok = false)
      else DecodedMedia(docId, payload.length.toLong, img.getWidth, img.getHeight,
        n_frames = 1, ok = true)
    }
  }

  /** Deterministic tiny PNG: a real codec writing real pixels (filled
    * from the splitmix64 stream so content is a pure function of
    * `seed`). Synthesizes image payloads for the q31 round-trip and the
    * specs — this environment ships no image corpus, but the codec
    * path itself is the production one.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk raster write, not width×height setRGB round-trips
    val px = new Array[Int](width * height)
    var i = 0
    while (i < px.length) {
      px(i) = (graft.functions.RhpPlanes.mix(seed * 1000003L + i) & 0xFFFFFF).toInt
      i += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** q31: binary payload + typed metadata, with width/height from a
    * REAL PNG encode→decode round-trip (ImageIO both ways). Each doc
    * synthesizes a (1 + n_chars mod 64) × (1 + doc_id mod 48) image —
    * dims are metadata-derived so the DuckDB oracle can predict them,
    * but the VALUES the query emits are read back from decoded pixels:
    * a codec bug, not a formula, is what would break the hash match.
    * blob_len/blob_md5 checksum the document payload itself. One
    * narrow mapPartitions pass (the mapInPandas shape), no shuffle.
    */
  def multimodalMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val hex = graft.functions.Md5.hex(payload)
          val png = encodePng((1L + nChars % 64L).toInt, (1L + id % 48L).toInt, id)
          val dec = decodeImage(id, png)
          MultimodalMeta(id, payload.length.toLong, hex,
            dec.width.toLong, dec.height.toLong)
        }
      }
      .toDF()
  }

  /** Classic-vision image features from a decoded RGB raster — the
    * PUBLIC-KNOWLEDGE extractor that retired the repo's last declared
    * stub (a learned embedding model can slot into the same plumbing,
    * but everything below is computable, checkable arithmetic):
    *
    *  - 64-bin COLOR HISTOGRAM: 2 bits per channel, bin =
    *    (r>>6)·16 + (g>>6)·4 + (b>>6) — Swain & Ballard color
    *    indexing, the standard coarse quantization.
    *  - SOBEL EDGE COUNT: integer luma (r+g+b), 3×3 Sobel over
    *    interior pixels, edge where |gx|+|gy| ≥ 765 (one full
    *    channel-range step across the kernel).
    *
    * All-integer on purpose: the DuckDB oracle replays pixels from the
    * synthesizer's splitmix64 stream (mod-2⁶⁴ multiplies via HUGEINT)
    * and reproduces every count bit-for-bit — a hash-exact gate on a
    * real decode→feature path (PNG is lossless, so decoded pixels ARE
    * the synthesized stream; a codec or extractor bug breaks the
    * match).
    */
  final case class ImageFeatures(hist: Array[Long], domBin: Int, domCnt: Long,
                                 nzBins: Int, edgeCnt: Long, interior: Long)
  def imageFeatures(px: Array[Int], w: Int, h: Int): ImageFeatures = {
    val hist = new Array[Long](64)
    val luma = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i) & 0xFFFFFF
      val r = p >>> 16; val g = (p >>> 8) & 0xFF; val b = p & 0xFF
      hist(((r >>> 6) << 4) + ((g >>> 6) << 2) + (b >>> 6)) += 1L
      luma(i) = r + g + b
      i += 1
    }
    var domBin = 0; var domCnt = 0L; var nz = 0
    var k = 0
    while (k < 64) {
      if (hist(k) > 0L) nz += 1
      if (hist(k) > domCnt) { domCnt = hist(k); domBin = k } // first max = smallest bin
      k += 1
    }
    var edges = 0L; var interior = 0L
    if (w >= 3 && h >= 3) {
      interior = (w - 2).toLong * (h - 2).toLong
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val o = y * w + x
          val gx = (luma(o - w + 1) + 2 * luma(o + 1) + luma(o + w + 1)) -
                   (luma(o - w - 1) + 2 * luma(o - 1) + luma(o + w - 1))
          val gy = (luma(o + w - 1) + 2 * luma(o + w) + luma(o + w + 1)) -
                   (luma(o - w - 1) + 2 * luma(o - w) + luma(o - w + 1))
          if (math.abs(gx) + math.abs(gy) >= 765) edges += 1L
          x += 1
        }
        y += 1
      }
    }
    ImageFeatures(hist, domBin, domCnt, nz, edges, interior)
  }

  /** Feature VECTOR from an encoded image payload: the 64 histogram
    * bins normalized by pixel count, then edge density, then mean
    * luma — truncated/zero-padded to `dim`. Undecodable payloads map
    * to the zero vector (the ok=false analog). Dense `Array[Float]`,
    * ready for the Similarity operators unchanged.
    */
  def featuresOfImage(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        if (payload == null) Array.emptyByteArray else payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return out
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val f = imageFeatures(px, w, h)
    val n = px.length.toDouble
    var d = 0
    while (d < math.min(dim, 64)) { out(d) = (f.hist(d) / n).toFloat; d += 1 }
    if (dim > 64 && f.interior > 0L) out(64) = (f.edgeCnt.toDouble / f.interior).toFloat
    if (dim > 65) {
      var s = 0L; var i = 0
      while (i < px.length) { val p = px(i) & 0xFFFFFF
        s += (p >>> 16) + ((p >>> 8) & 0xFF) + (p & 0xFF); i += 1 }
      out(65) = (s / (765.0 * n)).toFloat
    }
    out
  }

  case class MediaFeatures(doc_id: Long, features: Array[Float])
  case class ResizedMedia(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFrames(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Feature extraction over payload batches (real histogram/edge
    * extractor over the q31 synthetic PNG corpus, real mapPartitions
    * plumbing + schema): binary column in, float-vector column out —
    * feeds straight into Similarity.knnBruteForce etc.
    */
  def extractFeatures(documents: DataFrame, dim: Int = 64,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val meta = documents
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
    implicit val enc = Encoders.product[MediaFeatures]
    meta.as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, nChars) =>
        val png = encodePng((1L + nChars % 64L).toInt, (1L + id % 48L).toInt, id)
        MediaFeatures(id, featuresOfImage(png, dim))
      }))
  }

  /** Output row of the q59 image-feature pass — all-integer so the
    * DuckDB oracle can replay it bit-for-bit. */
  case class ImageFeatureMeta(doc_id: Long, width: Long, height: Long,
                              dom_bin: Long, dom_cnt: Long, nz_bins: Long,
                              edge_cnt: Long)

  /** q59: REAL feature extraction over the q31 synthetic PNG corpus —
    * encode→decode round-trip through the actual codec, then the
    * histogram/Sobel extractor on the decoded raster. Emits the
    * dominant color bin (ties → smallest bin, by construction of the
    * first-max scan), its count, the number of occupied bins, and the
    * Sobel edge count. One narrow mapPartitions pass, no shuffle —
    * the q31 plan shape with the extractor in the loop. Hash-exact
    * oracle: pixels are splitmix64(doc_id·1000003 + i) & 0xFFFFFF,
    * replayed in SQL (see SparkEntry.oracleSql q59).
    */
  def imageFeatureMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = (1L + nChars % 64L).toInt
          val h = (1L + id % 48L).toInt
          val png = encodePng(w, h, id)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
          val f = imageFeatures(px, img.getWidth, img.getHeight)
          ImageFeatureMeta(id, img.getWidth.toLong, img.getHeight.toLong,
            f.domBin.toLong, f.domCnt, f.nzBins.toLong, f.edgeCnt)
        }
      }
      .toDF()
  }

  /** REAL pixel resample: decode → Graphics2D bilinear scale →
    * re-encode PNG (all JDK; the standard thumbnailing pass of an
    * image-corpus pipeline). Undecodable payloads yield an empty
    * payload with the claimed dims — the ok=false analog for a
    * transform that must stay 1→1.
    */
  def resizeReal(media: DataFrame, width: Int = 16, height: Int = 12,
                 batchSize: Int = 64): Dataset[ResizedMedia] = {
    val withPayload = media.select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[ResizedMedia]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, p) =>
        val src =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            if (p == null) Array.emptyByteArray else p))
          catch { case scala.util.control.NonFatal(_) => null }
        if (src == null) ResizedMedia(id, Array.emptyByteArray, width, height)
        else {
          val dst = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, width, height, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          ResizedMedia(id, bos.toByteArray, width, height)
        }
      }))
  }

  /** Resize stub for NON-image payloads (kept for the generic binary
    * path): deterministic truncation standing in for a pixel
    * resample — output payload is a prefix of the input, with the
    * claimed output dims carried beside it. Image payloads should use
    * `resizeReal`.
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

  /** Synthetic image corpus: one real PNG payload per document,
    * dimensions derived from doc metadata (this environment ships no
    * image files; the bytes are genuine PNG). Schema (doc_id, payload)
    * — the layout `decodeBatch` consumes.
    */
  def syntheticImages(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        (id, encodePng((1L + nChars % 64L).toInt, (1L + id % 48L).toInt, id))
      }
      .toDF("doc_id", "payload")
  }

  /** Partition-batched REAL decode — the Scala analog of `mapInPandas`:
    * each partition's (doc_id, payload) rows stream through ImageIO in
    * micro-batches of `batchSize` (the batch boundary is where a real
    * pipeline amortizes codec init / GPU transfer). Undecodable
    * payloads surface as ok=false rows, never exceptions. No shuffle:
    * purely narrow, scales linearly with input.
    */
  def decodeBatch(media: DataFrame, batchSize: Int = 64): Dataset[DecodedMedia] = {
    val withPayload = media.select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[DecodedMedia]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) => decodeImage(id, payload) }
        }
      }
  }

  // ---------------------------------------------------------------- audio

  /** A decoded audio record: container-level facts a real pipeline
    * filters on before any model runs (resample? mono-ize? too short?).
    */
  case class DecodedAudio(doc_id: Long, blob_len: Long, sample_rate: Long,
                          channels: Long, n_samples: Long, duration_ms: Long,
                          ok: Boolean)

  /** Output row of the q41 audio metadata pass. */
  case class AudioMeta(doc_id: Long, blob_len: Long, blob_md5: String,
                       sample_rate: Long, channels: Long, n_samples: Long,
                       duration_ms: Long)

  /** REAL WAV encode via the JDK's javax.sound.sampled (java.desktop
    * module — no external dependency, the audio analog of ImageIO):
    * 16-bit signed little-endian mono PCM, samples a pure function of
    * `seed` (splitmix stream), wrapped in a genuine RIFF/WAVE container
    * by AudioSystem.write.
    */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (graft.functions.RhpPlanes.mix(seed * 9176L + i) & 0xFFFF).toInt - 32768
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: AudioSystem parses the container and reports
    * format + frame count from the actual stream. ok=false for null,
    * empty, or unparseable payloads — same failure contract as
    * decodeImage.
    */
  def decodeAudio(docId: Long, payload: Array[Byte]): DecodedAudio = {
    if (payload == null || payload.isEmpty)
      DecodedAudio(docId, 0L, 0L, 0L, 0L, 0L, ok = false)
    else {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (ais == null)
        DecodedAudio(docId, payload.length.toLong, 0L, 0L, 0L, 0L, ok = false)
      else {
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val rate = fmt.getSampleRate.toLong
        DecodedAudio(docId, payload.length.toLong, rate,
          fmt.getChannels.toLong, n,
          if (rate > 0) n * 1000L / rate else 0L, ok = true)
      }
    }
  }

  /** q41: audio payload + typed metadata, with rate/channels/samples
    * from a REAL WAV encode→decode round-trip (javax.sound both ways).
    * Each doc synthesizes (1 + n_chars mod 4096) samples at
    * 8 or 16 kHz by doc parity — parameters are metadata-derived so
    * the DuckDB oracle can predict them, but the emitted VALUES are
    * read back from the parsed container: a codec defect, not a
    * formula, breaks the hash match. Narrow mapPartitions, no shuffle.
    */
  def audioMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val hex = graft.functions.Md5.hex(payload)
          val wav = encodeWav((1L + nChars % 4096L).toInt,
            (8000L * (1L + id % 2L)).toInt, id)
          val dec = decodeAudio(id, wav)
          AudioMeta(id, payload.length.toLong, hex, dec.sample_rate,
            dec.channels, dec.n_samples, dec.duration_ms)
        }
      }
      .toDF()
  }

  /** Partition-batched real audio decode — decodeBatch's audio twin. */
  def decodeAudioBatch(media: DataFrame, batchSize: Int = 64): Dataset[DecodedAudio] = {
    val withPayload = media.select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[DecodedAudio]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) => decodeAudio(id, payload) }
        }
      }
  }

  // ---------------------------------------------------------------- video

  /** REAL multi-frame container via the JDK's GIF writer (ImageIO
    * supports sequence writes) — the video analog of encodePng: every
    * frame's pixels are a pure function of (seed, frame index).
    */
  def encodeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try encodeGifWith(writer, width, height, nFrames, seed)
    finally writer.dispose()
  }

  /** encodeGif against a CALLER-OWNED writer — the per-partition reuse
    * path (writer lookup + plugin init amortize across a partition's
    * docs; `ImageWriter.reset()` makes it reusable).
    */
  def encodeGifWith(writer: javax.imageio.ImageWriter,
                    width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](width * height)
        var i = 0
        while (i < px.length) {
          px(i) = (graft.functions.RhpPlanes.mix(seed * 7349L + f * 1048583L + i)
            & 0xFFFFFF).toInt
          i += 1
        }
        img.setRGB(0, 0, width, height, px, 0, width)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.reset()
      out.close()
    }
    bos.toByteArray
  }

  /** REAL video-container decode: ImageIO parses the GIF and reports
    * the true frame count and dimensions. ok=false for null/empty/
    * unparseable payloads.
    */
  def decodeVideo(docId: Long, payload: Array[Byte]): DecodedMedia = {
    if (payload == null || payload.isEmpty)
      DecodedMedia(docId, 0L, 0, 0, 0, ok = false)
    else {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) DecodedMedia(docId, payload.length.toLong, 0, 0, 0, ok = false)
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val n = r.getNumImages(true) // forces a full container scan
          DecodedMedia(docId, payload.length.toLong,
            r.getWidth(0), r.getHeight(0), n, ok = n > 0)
        } catch {
          case scala.util.control.NonFatal(_) =>
            DecodedMedia(docId, payload.length.toLong, 0, 0, 0, ok = false)
        } finally { r.dispose(); in.close() }
      }
    }
  }

  /** REAL keyframe sampling (replaces the byte-slicing stub for
    * payloads that are genuine containers): decode the GIF, pick
    * `nFrames` evenly spaced frames, re-encode each as PNG. 1→N rows,
    * narrow, batched — the decode-transform-reencode shape of a video
    * ingest pipeline.
    */
  def sampleFramesReal(media: DataFrame, nFrames: Int = 4,
                       batchSize: Int = 16): Dataset[MediaFrames] = {
    val withPayload = media.select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[MediaFrames]
    withPayload.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, p) =>
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(if (p == null) Array.emptyByteArray else p))
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) { in.close(); Iterator.empty }
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val total = r.getNumImages(true)
            val take = math.min(nFrames, total)
            (0 until take).iterator.map { k =>
              val idx = if (take == 1) 0 else k * (total - 1) / (take - 1)
              val img = r.read(idx)
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              MediaFrames(id, k, bos.toByteArray)
            }.toVector.iterator
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
          finally { r.dispose(); in.close() }
        }
      }))
  }

  /** q43: video payload + typed metadata via a REAL GIF encode→decode
    * round-trip (multi-frame ImageIO both ways). Frame count and dims
    * derive from doc metadata so the oracle predicts them; the emitted
    * values come from the PARSED container — the q31/q41 contract for
    * the third modality.
    */
  def videoMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        // ONE writer per partition (the codec-init amortization the
        // batch boundary exists for), reset between docs
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val mapped = it.map { case (id, text, nChars) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val hex = graft.functions.Md5.hex(payload)
          val gif = encodeGifWith(writer, (1L + nChars % 32L).toInt,
            (1L + id % 24L).toInt, (1L + id % 7L).toInt, id)
          val dec = decodeVideo(id, gif)
          (id, payload.length.toLong, hex, dec.width.toLong, dec.height.toLong,
            dec.n_frames.toLong)
        }
        // dispose after the partition drains (iterator wrapper)
        new Iterator[(Long, Long, String, Long, Long, Long)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) writer.dispose()
            h
          }
          def next() = mapped.next()
        }
      }
      .toDF("doc_id", "blob_len", "blob_md5", "width", "height", "n_frames")
  }

  /** 64-bit average-hash (aHash) of a decoded image: integer BOX
    * FILTER to 8×8 (cell (cy,cx) averages the pixels whose row maps
    * to cy via (y·8) div h and column to cx via (x·8) div w — a true
    * area mean, every source pixel in exactly one cell), integer luma
    * per pixel (299r + 587g + 114b, the BT.601 weights ×1000 — no
    * floating point), threshold strictly above the integer mean of
    * the 64 cell values. EVERY step is truncating int64 arithmetic on
    * nonnegative operands, so the hash is not merely deterministic —
    * it is SQL-replayable (DuckDB `//` + the q59 splitmix64 pixel
    * replay reproduce it bit-for-bit, which is what promoted q50 from
    * rows-only to hash-exact). The box mean is also the more robust
    * downsample: Graphics2D's bilinear drawImage (the previous
    * implementation) point-samples sparsely at large ratios and its
    * tap placement is an implementation detail no oracle could
    * follow. Images narrower than 8 in a dimension leave some cells
    * empty; an empty cell contributes value 0 (the q50 corpus floors
    * dims at 8, so all 64 cells are populated there).
    */
  def aHash(src: java.awt.image.BufferedImage): Long = {
    val w = src.getWidth
    val h = src.getHeight
    val px = src.getRGB(0, 0, w, h, null, 0, w)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val l = 299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF)
      val cell = ((i / w * 8) / h) * 8 + (i % w * 8) / w
      sums(cell) += l
      cnts(cell) += 1L
      i += 1
    }
    var mean = 0L
    var k = 0
    while (k < 64) {
      if (cnts(k) > 0L) sums(k) /= cnts(k) else sums(k) = 0L
      mean += sums(k)
      k += 1
    }
    mean /= 64L
    var sig = 0L
    k = 0
    while (k < 64) { if (sums(k) > mean) sig |= (1L << k); k += 1 }
    sig
  }

  /** q50: IMAGE near-duplicate grouping by perceptual hash — the
    * multimodal member of the dedup family: an image corpus dedups on
    * pixel CONTENT (the same photo re-encoded, resized, or touched up
    * hashes alike), not on byte checksums. Classic average-hash:
    * decode → 8×8 bilinear downsample → 64-bit mean-threshold
    * signature (`aHash` above); byte-identical payloads agree in all
    * 64 bits by construction, mild pixel perturbations move few bits
    * (both property-gated in MultimodalSpec), and grouping is exact
    * aHash equality — one hash aggregation after the codec pass.
    *
    * Payloads are synthesized from the NORMALIZED text (q20's dedup
    * identity: trim/lower/collapse-whitespace) — documents that are
    * exact-text duplicates carry byte-identical images, giving the
    * corpus the planted-duplicate structure of a real image corpus.
    * HASH-EXACT oracle (promoted r11 from rows-only): the DuckDB side
    * recomputes the poly-hash seed from the normalized text, replays
    * the synthesizer's splitmix64 pixel stream (the q59 HUGEINT
    * technique), and reruns the box-filter aHash — all-integer, so
    * signature, groups, reps and keeps compare bit-for-bit. PNG
    * losslessness plus the real ImageIO decode in the loop mean a
    * codec defect (not just a formula slip) breaks the match.
    *
    * Scale: one narrow mapPartitions codec pass (no shuffle), one
    * hash-partitioned aggregation on the 8-byte signature, one
    * broadcast-or-shuffle join back — the q20 plan shape with a codec
    * front end. Output: (doc_id, ahash, group_rep, keep, group_size).
    */
  def imageDedup(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val hashed = documents
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val norm = text.replaceAll("^\\s+|\\s+$", "")
          .toLowerCase(java.util.Locale.ROOT) // match Spark lower()
          .replaceAll("\\s+", " ")
        val seed = graft.functions.PolyHashExpr.hash(norm)
        // dims derive from the TEXT hash, not doc_id: identical texts
        // must produce identical payloads end to end
        val w = 8 + (seed % 56L).toInt
        val h = 8 + ((seed / 64L) % 40L).toInt
        val png = encodePng(w, h, seed)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        (id, aHash(img))
      }).toDF("doc_id", "ahash")
      // materialize ONCE (eager localCheckpoint, SURVEY §8 — the q40
      // mechanism): groups derives from hashed and joins back, and the
      // two subtrees plan structurally different exchanges, so without
      // this every document would be PNG-encoded, decoded, resampled
      // and hashed TWICE — the codec pass is the dominant cost
      .localCheckpoint(true)
    val groups = hashed.groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("group_rep"), count(lit(1)).as("group_size"))
    hashed.join(groups, Seq("ahash"))
      .select(col("doc_id"), col("ahash"), col("group_rep"),
        (col("doc_id") === col("group_rep")).cast("long").as("keep"),
        col("group_size"))
  }
}
