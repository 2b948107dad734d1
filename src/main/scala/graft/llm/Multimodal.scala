package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata; decode / feature-extract /
  * resize / frame-sample run batched per partition (the Scala analogue of
  * `mapInPandas` — one library context per partition, vectorizable batch
  * loop inside).
  *
  * The actual media decode is STUBBED (`decodeStub`): this container has no
  * image/audio codecs, so the "decode" computes deterministic byte-level
  * features (length, md5, head bytes). The partitioning, schema, batch
  * shape and metadata math around it are real — swapping `decodeStub` for a
  * JNI/FFmpeg call changes one function.
  *
  * Scale: `mapPartitions` keeps one decoder context per task; binary
  * payloads never shuffle (feature extraction projects them away before any
  * wide op); frame sampling is pure metadata arithmetic followed by a
  * narrow explode.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
  case class MediaItem(mediaId: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      contentMd5: String,
      head8Hex: String,
      width: Int,
      height: Int)

  /** STUB decode: byte-level features standing in for a real codec call.
    * One MessageDigest per partition (the "library context"), reused across
    * the batch — the real-decoder resource pattern.
    */
  def decodeStub(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val digest = md.digest(m.bytes).map("%02x".format(_)).mkString
        val head = m.bytes.take(8).map("%02x".format(_)).mkString
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, digest, head,
          m.meta.width, m.meta.height)
      }
    }
  }

  /** Resize plumbing: recompute target metadata, pass payload through the
    * (stubbed) transcode. Aspect ratio preserved, longest edge bounded.
    */
  def resizeMeta(df: DataFrame, maxEdge: Int): DataFrame =
    df.withColumn("scale",
        least(lit(1.0), lit(maxEdge) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", floor(col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling: one row per sampled frame index from duration + fps
    * metadata — pure arithmetic then a narrow explode (no payload copy;
    * a real sampler would slice `bytes` per frame in the decode stage).
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("meta.durationMs") - 1, lit(0L)),
          lit(everyMs))))
      .select(col("mediaId").as("media_id"), col("kind"), col("frame_ms"))

  /** Build MediaItems from the documents table: utf-8 payload bytes with
    * synthesized typed metadata (deterministic from n_chars).
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        MediaItem(id, "text-as-image-stub", text.getBytes("UTF-8"),
          MediaMeta((n % 640).toInt + 32, ((n * 7) % 480).toInt + 32,
            n * 10, "stub"))
      }
  }
}
