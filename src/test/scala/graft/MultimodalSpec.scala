package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batched mapPartitions decode, declarative
  * header metadata, frame sampling. The image kind round-trips real PNG
  * bytes through javax.imageio; audio/video use the deterministic stub. */
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
    val f = feats.filter($"media_id" === 7L).collect().head // 7 % 3 → audio
    assert((f.width, f.height) === Multimodal.fixtureDims(7L))
    assert(f.brightness > 0.0 && f.brightness < 256.0)
    assert(f.n_bytes > 4)
    assert(f.sha.length === 16)
  }

  test("image kind decodes real PNG payloads to exact dims + brightness") {
    val img = Multimodal.extractFeatures(media)
      .filter($"kind" === "image" && $"media_id" === 6L).collect().head
    // solid-gray PNG rendered from doc_id
    assert((img.width, img.height) === Multimodal.fixtureDims(6L))
    assert(img.brightness === 6.0) // PNG is lossless: mean luminance = gray
  }

  test("PNG and JPEG round-trip through the ImageIO codec") {
    val png = Multimodal.ImageCodec.encodeGrayPng(33, 21, 120)
    assert(Multimodal.ImageCodec.decode(png).contains((33, 21, 120.0)))
    // JPEG: lossy — dims exact, near-constant image stays close in level
    val buf = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 12).foreach(y => (0 until 16).foreach(x =>
      buf.setRGB(x, y, 0x505050)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "jpg", out)
    val Some((w, h, b)) = Multimodal.ImageCodec.decode(out.toByteArray)
    assert(w === 16 && h === 12)
    assert(math.abs(b - 0x50) < 4.0)
    // not-an-image bytes decode to None, never throw
    assert(Multimodal.ImageCodec.decode("junk".getBytes).isEmpty)
  }

  test("declarative header metadata agrees with the batched decode") {
    // images: real PNG IHDR parse; stubbed kinds: the fake 4-byte header —
    // either way the header peek must equal the full decode
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
    assert(declarative.size === 500)
  }

  test("resize: target dims, constant gray preserved, non-images pass") {
    val resized = Multimodal.resizeImages(media, 24, 24)
    val img = Multimodal.extractFeatures(resized.filter($"resized"))
      .filter($"media_id" === 6L).collect().head
    assert(img.width === 24 && img.height === 24)
    // bilinear scaling of a constant image is the constant; PNG is
    // lossless — brightness survives the resize exactly
    assert(img.brightness === 6.0)
    val passthrough = resized.filter(!$"resized").count()
    assert(passthrough === media.filter($"kind" =!= "image").count())
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

  test("scene cuts: signature deltas flag jumps, first frame never") {
    // crafted clip: sampled frames at body offsets 0/64/128 read
    // "a"×16 (sig 1552), "a"×15+"b" (1553, delta 1 → no cut),
    // "z"×16 (1952, delta 399 → cut); 'x' filler between frames
    val body = ("a" * 16) + ("x" * 48) + ("a" * 15 + "b") +
      ("x" * 48) + ("z" * 16)
    val clip = Seq((1L, "video", ("HDR0" + body).getBytes("US-ASCII")))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.sceneCuts(clip, threshold = 120L)
      .orderBy($"frame_idx").collect()
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("sig"),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_cut")))
    assert(got.toSeq === Seq(
      (0, 1552L, None, false), // no predecessor → never a cut
      (1, 1553L, Some(1L), false),
      (2, 1952L, Some(399L), true)))
  }

  test("aHash matches the pixel formula and degenerates on solid gray") {
    // independent reference: recompute the 8×8 integer cell-mean bits
    // straight from the generator formula (PNG is lossless, so the
    // decode path must reproduce it bit-for-bit)
    def reference(seed: Long, w: Int, h: Int): String = {
      val sums = new Array[Long](64); val counts = new Array[Long](64)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((seed + x.toLong * y) % 256).toInt
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        sums(cell) += v; counts(cell) += 1; total += v
      }
      val n = w.toLong * h
      (0 until 64).map(i =>
        if (sums(i) * n >= total * counts(i)) '1' else '0').mkString
    }
    val rows = Seq(5L, 6L, 7L).map { id =>
      val (w, h) = Multimodal.fixtureDims(id)
      Multimodal.MediaRow(id, "image",
        Multimodal.ImageCodec.encodePatternPng(w, h, id))
    }
    val got = Multimodal.imageAHash(rows.toDF())
      .as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val (w, h) = Multimodal.fixtureDims(r.media_id)
      assert(got(r.media_id) === reference(r.media_id, w, h))
      assert(got(r.media_id).length === 64)
    }
    // structure check: patterned images differ; a solid gray is the
    // degenerate all-ones hash (every cell equals the mean)
    assert(got.values.toSet.size === rows.length)
    val solid = Multimodal.imageAHash(Seq(Multimodal.MediaRow(9L,
        "image", Multimodal.ImageCodec.encodeGrayPng(16, 16, 42))).toDF())
      .as[(Long, String)].collect().head._2
    assert(solid === "1" * 64)
  }

  test("perceptual near-dup finds every re-uploaded duplicate at hamming 0") {
    val dup = Multimodal.patternDupTable(spark, sf0001)
    val pairs = Multimodal.imageNearDupPairs(dup)
      .as[(Long, Long, Int)].collect()
    // every injected exact duplicate (id, id + 1e6) must surface with
    // hamming 0 — identical payload, identical hash
    val injected = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 5 === 0).select($"doc_id").as[Long]
      .collect().toSet
    val zero = pairs.filter(_._3 == 0)
      .map(p => (p._1, p._2)).toSet
    assert(injected.forall(id => zero.contains((id, id + 1000000L))))
    // banding is exact at maxHamming <= 3: equal to brute-force
    // hamming over the hash table (the pigeonhole claim, machine-checked)
    val h = Multimodal.imageAHash(dup).as[(Long, String)].collect()
    def ham(a: String, b: String) =
      a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      (ia, ba) <- h; (ib, bb) <- h if ia < ib && ham(ba, bb) <= 3
    } yield (ia, ib, ham(ba, bb))).toSet
    assert(pairs.toSet === brute)
  }

  test("audio features: LE int16 round-trip and exact integer DSP") {
    // id 7 is an audio row (7 % 3 == 1); recompute every feature from
    // the closed-form wave on the driver and compare bit-for-bit
    val id = 7L
    val n = Multimodal.audioSampleCount(id)
    val samples = (0 until n).map(Multimodal.pcmSampleAt(id, _))
    val f = Multimodal.audioFeatures(media)
      .filter($"media_id" === id).collect().head
    assert(f.n_samples === n)
    assert(f.n_frames === (n + 63) / 64)
    assert(f.sum_sq === samples.map(s => s.toLong * s).sum)
    assert(f.peak === samples.map(math.abs).max)
    // the wave exercises BOTH int16 sign branches (negatives decode
    // through the little-endian high byte)
    assert(samples.min < 0 && samples.max > 0)
    // every audio row decodes (one output row per input)
    assert(Multimodal.audioFeatures(media).count() ===
      media.filter($"kind" === "audio").count())
  }

  test("quiet spans: hand-checked runs; one row per clip contract") {
    // id 7's wave: recompute per-frame energies on the driver, apply
    // the same strictly-below-mean rule, and check the longest run
    val id = 7L
    val n = Multimodal.audioSampleCount(id)
    val samples = (0 until n).map(Multimodal.pcmSampleAt(id, _))
    val energies = samples.grouped(64)
      .map(_.map(s => s.toLong * s).sum).toSeq
    val tot = energies.sum
    val quiet = energies.map(_ * energies.size < tot)
    val longest = {
      var best = 0; var cur = 0
      quiet.foreach { q =>
        cur = if (q) cur + 1 else 0; best = math.max(best, cur) }
      best.toLong
    }
    val r = Multimodal.quietSpans(media)
      .filter($"media_id" === id).collect().head
    assert(r.getAs[Long]("n_frames") === energies.size.toLong)
    assert(r.getAs[Long]("n_quiet") === quiet.count(identity).toLong)
    assert(r.getAs[Long]("longest_quiet_run") === longest)
    // one row per audio clip, no more, no fewer
    assert(Multimodal.quietSpans(media).count() ===
      media.filter($"kind" === "audio").count())
  }

  test("quiet spans: a zero-frame clip still emits its summary row") {
    // payload of ≤ 4 bytes (header only) decodes to zero PCM frames
    val tiny = Seq((99L, "audio", Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.quietSpans(tiny).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_frames") === 0L)
    assert(r.head.getAs[Long]("n_quiet") === 0L)
    assert(r.head.getAs[Long]("longest_quiet_run") === 0L)
  }
}
