package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batched mapPartitions decode, declarative
  * header metadata, frame sampling. The codec itself is a deterministic
  * stub; everything around it is real. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
      .repartition(4)
      .cache()

  test("payload carries header + body; kinds partition deterministically") {
    assert(media.count() === 500)
    val kinds = media.groupBy($"kind").count().as[(String, Long)]
      .collect().toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(kinds.values.sum === 500)
  }

  test("batched decode emits one typed row per input with header fields") {
    val feats = Multimodal.extractFeatures(media, batchSize = 32)
    assert(feats.count() === 500)
    val f = feats.filter($"media_id" === 7L).collect().head
    assert(f.width === (64 + 7 % 192))
    assert(f.height === (64 + 7 % 128))
    assert(f.brightness > 0.0 && f.brightness < 256.0)
    assert(f.n_bytes > 4)
    assert(f.sha.length === 16)
  }

  test("declarative header metadata agrees with the batched decode") {
    val declarative = Multimodal.headerMetadata(media)
      .select($"media_id", $"width", $"height")
      .as[(Long, Int, Int)].collect().map {
        case (id, w, h) => id -> ((w, h))
      }.toMap
    val decoded = Multimodal.extractFeatures(media)
      .select($"media_id", $"width", $"height")
      .as[(Long, Int, Int)].collect().map {
        case (id, w, h) => id -> ((w, h))
      }.toMap
    assert(declarative === decoded)
  }

  test("frame sampling slices the body into strided fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 4)
    assert(frames.count() > 0)
    val one = frames.filter($"frame_idx" === 0).limit(1)
      .select(length($"frame")).as[Int].collect().head
    assert(one === 16)
    // only video rows produce frames
    val vids = media.filter($"kind" === "video").select($"media_id")
      .as[Long].collect().toSet
    val frameIds = frames.select($"media_id").distinct().as[Long]
      .collect().toSet
    assert(frameIds.subsetOf(vids))
  }
}
