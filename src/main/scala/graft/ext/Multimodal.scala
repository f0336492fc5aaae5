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

  /** Test harness: lift any (id, string) pair into a binary media column so
    * the plumbing is exercisable on the driver-provided `documents` table.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload")).as(enc)
  }
}
