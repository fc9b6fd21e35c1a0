package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` payloads with typed metadata; decode /
  * feature-extract / frame-sample run per partition in batches.
  *
  * The Spark side — schema, partitioning, batch shape, the
  * `mapPartitions`-with-batching pattern (the JVM twin of `mapInPandas`) —
  * is real and tested. The actual codec call is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries);
  * swap [[MediaCodecStub.decode]] for a real codec and nothing else moves.
  */
object Multimodal {

  /** One media row: payload + header-derived typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, width: Int, height: Int,
      brightness: Double, sha: String)

  /** ===== THE STUB — replace with a real codec (e.g. ImageIO/JavaCV). =====
    * Deterministic fake "decode": reads the 4-byte fake header as
    * (width, height) and derives a brightness from the payload bytes. */
  object MediaCodecStub {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val w = ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF)
      val h = ((payload(2) & 0xFF) << 8) | (payload(3) & 0xFF)
      val body = payload.drop(4)
      val brightness =
        if (body.isEmpty) 0.0
        else body.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / body.length
      (w, h, brightness)
    }
  }

  /** Synthesize a deterministic media table from `documents`: payload =
    * 4-byte header (width, height derived from doc_id) + UTF-8 text body.
    * Stands in for a parquet of real encoded images. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      concat(
        // fake header: width = 64 + id%192, height = 64 + id%128 (2B each)
        expr("unhex(lpad(hex(64 + doc_id % 192), 4, '0'))"),
        expr("unhex(lpad(hex(64 + doc_id % 128), 4, '0'))"),
        encode(col("text"), "UTF-8")).as("payload"))

  /** Batched per-partition decode — the `mapInPandas` pattern on the JVM:
    * consume the iterator in fixed-size batches so a real codec can reuse
    * buffers/handles across rows, emit one typed row per input. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real impl would open one codec context per batch here
          batch.iterator.map { r =>
            val (w, h, bright) = MediaCodecStub.decode(r.payload)
            val sha = java.security.MessageDigest.getInstance("SHA-256")
              .digest(r.payload).take(8).map("%02x".format(_)).mkString
            MediaFeatures(r.media_id, r.kind, r.payload.length, w, h,
              bright, sha)
          }
        }
      }
  }

  /** Declarative metadata decode of the same header — pure `Column` ops
    * over the binary (no stub): what you push down when only metadata is
    * needed and the payload column can be pruned away. */
  def headerMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      conv(hex(substring(col("payload"), 1, 2)), 16, 10).cast("int")
        .as("width"),
      conv(hex(substring(col("payload"), 3, 2)), 16, 10).cast("int")
        .as("height"))

  /** Frame sampling: every `stride`-th fixed-size block of the payload body
    * becomes a "frame" row (video → frame table). Pure plumbing: slicing,
    * posexplode, partition-preserving. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 4)
      : DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        expr("substring(payload, 5, length(payload) - 4)").as("body"))
      .withColumn("n_frames", (length(col("body")) / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        posexplode(expr(
          s"transform(sequence(0, cast((n_frames - 1) / $stride AS int)), " +
            s"i -> substring(body, i * $frameBytes * $stride + 1, " +
            s"$frameBytes))")).as(Seq("frame_idx", "frame")))
}
