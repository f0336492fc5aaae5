package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, and decode / feature-extract /
  * frame-sample run as typed `mapPartitions` stages (one decoder init per
  * partition, vectorized batches of rows — the Scala analog of
  * `mapInPandas`).
  *
  * The container has no codec libraries, so the decode kernels are STUBS
  * with deterministic fakes; the Spark-side contract — schema, partitioning,
  * batch shape, null handling — is real and tested. Swap [[StubCodecs]] for
  * a real JNI/ffmpeg-backed codec to productionize.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaMeta(id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, format: String)
  final case class Frame(id: Long, frame_idx: Long, byte_offset: Long)

  /** STUB decoders: deterministic pure functions of the payload bytes.
    * Replace with real image/audio decoding (e.g. javacv) in production —
    * signatures and batch shape stay the same.
    */
  object StubCodecs {
    def imageMeta(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(id, n,
        width = (n % 640).toInt + 1,
        height = ((n * 7) % 480).toInt + 1,
        channels = 3,
        format = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
    }
    val frameStride = 256L
    def frames(id: Long, payload: Array[Byte]): Iterator[Frame] =
      (0L to payload.length / frameStride).iterator
        .map(i => Frame(id, i, i * frameStride))

    /** STUB resize/re-encode: keeps every other byte (a real kernel would
      * decode, scale to `maxDim`, re-encode — same 1→1 bytes→bytes shape).
      */
    def resize(payload: Array[Byte], maxDim: Int): Array[Byte] = {
      val out = new Array[Byte]((payload.length + 1) / 2)
      var i = 0
      while (i < out.length) { out(i) = payload(i * 2); i += 1 }
      out
    }

    /** STUB visual-embedding extractor: deterministic unit-norm vector from
      * splitmix64 mixes of (payload bytes, dim index) — stands in for a
      * vision-encoder forward pass; same bytes → array<float> shape.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      var seed = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < payload.length) { seed = (seed ^ payload(i)) * 0xBF58476D1CE4E5B9L; i += 1 }
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var z = seed + (d + 1).toLong * 0x94D049BB133111EBL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        v(d) = ((z ^ (z >>> 31)).toDouble / Long.MaxValue).toFloat
        d += 1
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      var j = 0
      while (j < dim) { v(j) = v(j) / n; j += 1 }
      v
    }
  }

  /** Decode image metadata for every row. One decoder per partition; rows
    * stream through without buffering the partition.
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] =
    media.mapPartitions { it =>
      // per-partition decoder init would go here (JNI context, thread pools)
      it.map(r => StubCodecs.imageMeta(r.id, r.payload))
    }(Encoders.product[MediaMeta])

  /** Sample frames from a video payload, 1→N. */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] =
    media.mapPartitions(_.flatMap(r => StubCodecs.frames(r.id, r.payload)))(Encoders.product[Frame])

  /** Resize/re-encode every payload (1→1 binary→binary, narrow). */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int = 224): Dataset[MediaRow] =
    media.mapPartitions(_.map(r => MediaRow(r.id, StubCodecs.resize(r.payload, maxDim))))(
      Encoders.product[MediaRow])

  final case class MediaEmbedding(id: Long, embedding: Array[Float])

  /** Visual-embedding extraction: binary payload → `array<float>` column,
    * ready for [[Similarity]]'s ANN operators — the multimodal→embedding→
    * near-dup pipeline in one narrow stage.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] =
    media.mapPartitions(_.map(r => MediaEmbedding(r.id, StubCodecs.features(r.payload, dim))))(
      Encoders.product[MediaEmbedding])

  /** Test harness: lift any (id, string) pair into a binary media column so
    * the plumbing is exercisable on the driver-provided `documents` table.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload")).as(enc)
  }

  /** 60-bit perceptual difference-hash (dHash) over a codec-free STUB
    * decode — the image-dedup path the container's missing codec libraries
    * allow. Real dHash: resize to a (rows+1)-wide grayscale grid, set one
    * bit per adjacent-pixel comparison; near-identical images then differ
    * in few bits, found via [[graft.ext.Dedup.simHashPairs]]' pigeonhole
    * bands — NEVER an all-pairs compare. The stub decode stands in for
    * resize+grayscale with a deterministic locality-preserving sample:
    * pixel (r,c) = first md5 byte of the fixed-stride payload window at
    * index r*11+c (matching windows ⇒ matching pixels, so payloads sharing
    * most content share most bits; windows past the payload end hash ""
    * and contribute constant pixels). Swapping in a real decoder changes
    * ONLY the pixel function — grid, banding and pair search stay.
    *
    * Entirely codegen built-ins (md5/substring/conv), reproducible by the
    * DuckDB oracle (x32). The payload is interpreted as UTF-8 text and
    * windowed by CHARACTERS — part of the stub contract (a byte windowing
    * would be unreproducible in portable SQL for multi-byte text).
    *
    * Known hazard (shared with real dHash): LOW-TEXTURE payloads — here,
    * ones shorter than the ~460-unit sampled range; in production, flat or
    * near-empty images — collapse toward few distinct hashes and pair
    * densely, making their bands hot join keys. Filter degenerate payloads
    * upstream (length/quality gates) before pairing a 100 TB corpus, the
    * same stance as [[graft.ext.Dedup.jaccardPairs]]' df cap.
    *
    * Output (id, simhash) feeds [[graft.ext.Dedup.simHashPairs]] directly.
    */
  def pHash(media: DataFrame, idCol: String = "id",
            payloadCol: String = "payload"): DataFrame = {
    val window = 8
    val stride = 7
    val text = col(payloadCol).cast("string")
    def pixel(idx: Int) =
      conv(substring(md5(substring(text, 1 + idx * stride, window)), 1, 2), 16, 10)
        .cast("long")
    val bits =
      for (r <- 0 until 6; c <- 0 until 10)
        yield when(pixel(r * 11 + c) < pixel(r * 11 + c + 1),
          lit(1L << (r * 10 + c))).otherwise(lit(0L))
    media.select(col(idCol).as("id"), bits.reduce(_ + _).as("simhash"))
  }

  /** Near-duplicate image pairs: Hamming distance <= maxHamming over
    * [[pHash]] signatures via the SimHash pigeonhole band join (equi-join
    * on signature bands — candidates scale with collisions, not pairs).
    */
  def pHashPairs(media: DataFrame, idCol: String = "id",
                 payloadCol: String = "payload", maxHamming: Int = 3): DataFrame =
    Dedup.simHashPairs(pHash(media, idCol, payloadCol), maxHamming)
}
