package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media features are deterministic, typed, and byte-derived") {
    val docs = graft.Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video")(r.kind))
      assert(r.n_bytes > 0)
      if (r.kind == "image") {
        // REAL decode: javax.imageio geometry equals the synthesized one
        val (w, h) = Multimodal.ImageIoCodec.synthDims(r.doc_id)
        assert(r.width == w && r.height == h && r.n_frames == 1,
          s"doc ${r.doc_id}: decoded ${r.width}x${r.height}, synthesized ${w}x$h")
      } else if (r.kind == "audio") {
        // REAL decode: javax.sound.sampled header fields equal the
        // synthesized rate/channels/sample-count
        assert(r.width == 8000 && r.height == 1 &&
          r.n_frames == Multimodal.WavCodec.synthNumSamples(r.doc_id),
          s"doc ${r.doc_id}: decoded rate=${r.width} ch=${r.height} n=${r.n_frames}")
      } else {
        // REAL decode: AVI demux + per-frame imageio geometry equals
        // the synthesized one
        val (w, h) = Multimodal.AviCodec.synthDims(r.doc_id)
        assert(r.width == w && r.height == h &&
          r.n_frames == Multimodal.AviCodec.synthNumFrames(r.doc_id),
          s"doc ${r.doc_id}: decoded ${r.width}x${r.height}x${r.n_frames}")
      }
      // audio carries the 32-dim four-band feature; image/video the
      // 8-dim quadrant-luminance one
      assert(r.feature.length == (if (r.kind == "audio") 32 else 8))
    }
    // determinism: second run identical
    val again = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
      .collect().map(r => (r.doc_id, r.width, r.height, r.n_frames)).toSet
    assert(again == rows.map(r => (r.doc_id, r.width, r.height, r.n_frames)).toSet)
  }

  test("resize fits within maxSide preserving aspect; never upscales") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
    val orig = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.doc_id -> (r.width, r.height)).toMap
    val resized = Multimodal.resize(spark, media, maxSide = 128).collect()
    resized.foreach { r =>
      val (w0, h0) = orig(r.doc_id)
      assert(r.width <= 128 && r.height <= 128 && r.width >= 1 && r.height >= 1)
      assert(r.width <= w0 && r.height <= h0)
      // aspect preserved within integer rounding
      if (w0 >= h0) assert(r.width >= r.height - 1) else assert(r.height >= r.width - 1)
      assert(r.payload.nonEmpty)
    }
  }

  test("frame sampling emits every stride-th frame of video rows only") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(spark, media, stride = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 10 == 0))
    val videoIds = Multimodal.extractFeatures(spark, media).collect()
      .filter(_.kind == "video").map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet == videoIds)
    val expectedCounts = Multimodal.extractFeatures(spark, media).collect()
      .filter(_.kind == "video")
      .map(r => r.doc_id -> ((r.n_frames + 9) / 10).toLong).toMap
    val gotCounts = frames.groupBy(_.doc_id).view.mapValues(_.length.toLong).toMap
    assert(gotCounts == expectedCounts)
  }

  test("null text rows survive the media path (payloads derive from doc_id alone)") {
    // since round 6 all three kinds synthesize their blobs from
    // doc_id — the text column no longer feeds any payload, so null
    // text cannot reach a codec (the old NPE class is structural now)
    val docs = Seq((2L, null: String), (5L, "real text")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs)).collect()
    assert(feats.length == 2)
    assert(feats.forall(f => f.kind == "video" && f.n_bytes > 0)) // 2,5 ≡ 2 (mod 3)
    assert(feats.forall(f => f.n_frames ==
      Multimodal.AviCodec.synthNumFrames(f.doc_id)))
  }

  test("null/corrupt payload rows degrade instead of failing any operator") {
    // feed genuinely-null and non-AVI binary payloads straight to each
    // operator, covering all three codec-touching paths, not just
    // extractFeatures — corrupt blobs degrade to zero dims / no rows
    val media = Seq[(Long, String, Array[Byte])](
      (1L, "image", null), (2L, "video", null),
      (3L, "video", "clip bytes".getBytes("UTF-8")),
      (4L, "video", Multimodal.AviCodec.synthesize(4L)))
      .toDF("doc_id", "kind", "payload")
    val resized = Multimodal.resize(spark, media, maxSide = 128).collect()
    assert(resized.length == 4)
    // undecodable rows: zero dims + empty payload; the valid AVI resizes
    assert(resized.filter(_.doc_id != 4L)
      .forall(r => r.width == 0 && r.height == 0 && r.payload.isEmpty))
    val ok = resized.find(_.doc_id == 4L).get
    assert(ok.width == Multimodal.AviCodec.synthDims(4L)._1 && ok.payload.nonEmpty)
    // frame sampling: only the valid container contributes rows
    val frames = Multimodal.sampleFrames(spark, media, stride = 10).collect()
    assert(frames.map(_.doc_id).toSet == Set(4L))
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.count(_.n_bytes == 0) == 2) // the two null payloads
    assert(feats.filter(f => f.doc_id != 4L).forall(_.n_frames == 0)) // degraded
  }

  test("image rows decode through javax.imageio with true pixel geometry and pixel features") {
    val png = Multimodal.ImageIoCodec.synthesize(42L)
    val img = Multimodal.ImageIoCodec.decode(png).get
    val (w, h) = Multimodal.ImageIoCodec.synthDims(42L)
    assert(img.getWidth == w && img.getHeight == h)
    // pixel content round-trips the synthesis formula (PNG is lossless)
    assert((img.getRGB(3, 5) & 0xffffff) == ((42L * 31 + 3 * 7 + 5 * 13) & 0xffffffL).toInt)
    val feats = Multimodal.ImageIoCodec.features(img)
    assert(feats.length == 8)
    assert(feats(7) == w.toFloat / h) // aspect channel
    assert(feats.take(7).forall(f => f >= 0f && f <= 1f)) // normalized pixel stats
  }

  test("image resize REALLY resamples: output PNG decodes to the target geometry") {
    val docs = graft.Tables.documents(spark, sf)
    val media = Multimodal.asMedia(docs)
      .filter($"kind" === "image").limit(20)
    val resized = Multimodal.resize(spark, media, maxSide = 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val back = Multimodal.ImageIoCodec.decode(r.payload).get // valid PNG out
      assert(back.getWidth == r.width && back.getHeight == r.height,
        s"doc ${r.doc_id}: payload decodes ${back.getWidth}x${back.getHeight}, " +
          s"row claims ${r.width}x${r.height}")
      assert(math.max(r.width, r.height) <= 16)
      val (w0, h0) = Multimodal.ImageIoCodec.synthDims(r.doc_id)
      // aspect-preserving fit, never upscaled
      val scale = math.min(1.0, 16.0 / math.max(w0, h0))
      assert(r.width == math.max(1, (w0 * scale).toInt))
      assert(r.height == math.max(1, (h0 * scale).toInt))
      // nearest-neighbor sampling: corner pixel comes from the source formula
      assert((back.getRGB(0, 0) & 0xffffff) ==
        ((r.doc_id * 31) & 0xffffffL).toInt)
    }
  }

  test("decodePixelSums: real decode matches the synthesis formula exactly") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "image").limit(25)
    val sums = Multimodal.decodePixelSums(spark, media).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val (w, h) = Multimodal.ImageIoCodec.synthDims(r.doc_id)
      assert(r.width == w && r.height == h)
      // recompute the channel sums straight from the pixel formula —
      // equality proves PNG encode → imageio decode is byte-faithful
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((r.doc_id * 31 + x * 7 + y * 13) & 0xffffffL).toInt
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
      assert(r.sum_r == sr && r.sum_g == sg && r.sum_b == sb,
        s"doc ${r.doc_id}: decoded sums (${r.sum_r},${r.sum_g},${r.sum_b}) " +
          s"!= formula ($sr,$sg,$sb)")
    }
    // corrupt payload degrades to zero sums, not a task failure
    val bad = Seq((7L, "image", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "kind", "payload")
    val z = Multimodal.decodePixelSums(spark, bad).collect()
    assert(z.head.width == 0 && z.head.sum_r == 0)
  }

  test("audio rows decode through javax.sound.sampled with exact samples") {
    val wavBytes = Multimodal.WavCodec.synthesize(43L)
    val (rate, samples) = Multimodal.WavCodec.decode(wavBytes).get
    assert(rate == 8000f)
    assert(samples.length == Multimodal.WavCodec.synthNumSamples(43L))
    // PCM is lossless: every decoded sample equals the synthesis formula
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s == Multimodal.WavCodec.synthSample(43L, i),
        s"sample $i: decoded $s != formula ${Multimodal.WavCodec.synthSample(43L, i)}")
    }
    val feats = Multimodal.WavCodec.features(samples)
    assert(feats.length == 32)
    // band [0,8): normalized amplitude means
    assert(feats.take(8).forall(f => f >= 0f && f <= 1f))
    // bands [8,32): zero-mean, scaled ×8 — bounded by ±8
    assert(feats.drop(8).forall(f => f >= -8f && f <= 8f))
    // the zero-mean bands must actually discriminate: not all ~0
    assert(feats.drop(8).exists(f => math.abs(f) > 0.01f))
    // corrupt payload degrades to None, not an exception
    assert(Multimodal.WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.WavCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("audio resize REALLY clips: output WAV decodes to the target sample count") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "audio").limit(10)
    val resized = Multimodal.resize(spark, media, maxSide = 100).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (rate, back) = Multimodal.WavCodec.decode(r.payload).get // valid WAV out
      assert(rate == 8000f)
      val n0 = Multimodal.WavCodec.synthNumSamples(r.doc_id)
      assert(r.width == math.min(n0, 100) && r.height == 1)
      assert(back.length == r.width,
        s"doc ${r.doc_id}: payload decodes ${back.length} samples, row claims ${r.width}")
      // clipped content is the PREFIX of the source samples
      back.zipWithIndex.foreach { case (s, i) =>
        assert(s == Multimodal.WavCodec.synthSample(r.doc_id, i))
      }
    }
  }

  test("decodeSampleSums: real audio decode matches the synthesis formula exactly") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "audio").limit(25)
    val sums = Multimodal.decodeSampleSums(spark, media).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val n = Multimodal.WavCodec.synthNumSamples(r.doc_id)
      assert(r.sample_rate == 8000L && r.n_samples == n)
      var s = 0L; var a = 0L
      for (i <- 0 until n) {
        val v = Multimodal.WavCodec.synthSample(r.doc_id, i).toLong
        s += v; a += math.abs(v)
      }
      assert(r.sum_samples == s && r.sum_abs == a,
        s"doc ${r.doc_id}: decoded sums (${r.sum_samples},${r.sum_abs}) != formula ($s,$a)")
    }
    // corrupt payload degrades to zero sums, not a task failure
    val bad = Seq((7L, "audio", Array[Byte](9, 9, 9)))
      .toDF("doc_id", "kind", "payload")
    val z = Multimodal.decodeSampleSums(spark, bad).collect()
    assert(z.head.sample_rate == 0 && z.head.sum_abs == 0)
  }

  test("WAV decode handles stereo (channel 0) and big-endian sample layouts") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    def wav(fmt: AudioFormat, data: Array[Byte], frames: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // stereo little-endian: decode must read channel 0 of each frame
    val stereo = new AudioFormat(8000f, 16, 2, true, false)
    val samples = Array[Short](100, -200, 300)
    val data = new Array[Byte](samples.length * 4)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(4 * i) = (s & 0xff).toByte            // ch0 lo
      data(4 * i + 1) = ((s >> 8) & 0xff).toByte // ch0 hi
      data(4 * i + 2) = 0x11; data(4 * i + 3) = 0x22 // ch1 junk
    }
    val (rate, ch0) = Multimodal.WavCodec.decode(wav(stereo, data, samples.length.toLong)).get
    assert(rate == 8000f && ch0.toSeq == samples.toSeq)
    // big-endian mono: byte order must follow the header, not assumption
    val be = new AudioFormat(16000f, 16, 1, true, true)
    val beData = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      beData(2 * i) = ((s >> 8) & 0xff).toByte
      beData(2 * i + 1) = (s & 0xff).toByte
    }
    val (rate2, got) = Multimodal.WavCodec.decode(wav(be, beData, samples.length.toLong)).get
    assert(rate2 == 16000f && got.toSeq == samples.toSeq)
    // 8-bit payloads are rejected (None), not misparsed
    val fmt8 = new AudioFormat(8000f, 8, 1, true, false)
    assert(Multimodal.WavCodec.decode(wav(fmt8, Array[Byte](1, 2, 3), 3L)).isEmpty)
  }

  test("video rows demux through a real AVI container with per-frame imageio decode") {
    val avi = Multimodal.AviCodec.synthesize(44L)
    // the container is a genuine RIFF AVI: signature bytes are real
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val (fps, frames) = Multimodal.AviCodec.decodeFrames(avi).get
    // fps comes from the REAL strh header (dwRate/dwScale), not a formula re-run
    assert(fps == Multimodal.AviCodec.synthFps(44L))
    assert(frames.length == Multimodal.AviCodec.synthNumFrames(44L))
    val (w, h) = Multimodal.AviCodec.synthDims(44L)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == w && img.getHeight == h)
      // PNG frames are lossless: pixels round-trip the synthesis formula
      assert((img.getRGB(3, 5) & 0xffffff) ==
        Multimodal.AviCodec.synthPixel(44L, f, 3, 5))
    }
    val feats = Multimodal.AviCodec.features(frames)
    assert(feats.length == 8)
    assert(feats(7) == w.toFloat / h) // aspect channel, frame-constant
    // corrupt payloads degrade to None, not an exception
    assert(Multimodal.AviCodec.parse("not an avi".getBytes).isEmpty)
    assert(Multimodal.AviCodec.parse(Array.emptyByteArray).isEmpty)
    assert(Multimodal.AviCodec.parse(avi.take(40)).isEmpty) // truncated
  }

  test("decodeFrameSums: real video decode matches the synthesis formula exactly") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "video").limit(25)
    val sums = Multimodal.decodeFrameSums(spark, media).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val (w, h) = Multimodal.AviCodec.synthDims(r.doc_id)
      val nf = Multimodal.AviCodec.synthNumFrames(r.doc_id)
      assert(r.width == w && r.height == h && r.n_frames == nf &&
        r.fps == Multimodal.AviCodec.synthFps(r.doc_id))
      // recompute the channel sums straight from the pixel formula —
      // equality proves AVI demux → PNG decode is byte-faithful
      var sr = 0L; var sg = 0L; var sb = 0L
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.AviCodec.synthPixel(r.doc_id, f, x, y)
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
      assert(r.sum_r == sr && r.sum_g == sg && r.sum_b == sb,
        s"doc ${r.doc_id}: decoded sums (${r.sum_r},${r.sum_g},${r.sum_b}) " +
          s"!= formula ($sr,$sg,$sb)")
    }
    // corrupt payload degrades to zero sums, not a task failure
    val bad = Seq((7L, "video", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "kind", "payload")
    val z = Multimodal.decodeFrameSums(spark, bad).collect()
    assert(z.head.width == 0 && z.head.n_frames == 0 && z.head.sum_r == 0)
  }

  test("video resize REALLY resamples: output AVI demuxes + decodes to the target geometry") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "video").limit(10)
    val resized = Multimodal.resize(spark, media, maxSide = 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (fps, back) = Multimodal.AviCodec.decodeFrames(r.payload).get // valid AVI out
      assert(fps == Multimodal.AviCodec.synthFps(r.doc_id)) // fps preserved
      assert(back.length == Multimodal.AviCodec.synthNumFrames(r.doc_id))
      back.foreach { img =>
        assert(img.getWidth == r.width && img.getHeight == r.height)
        assert(math.max(img.getWidth, img.getHeight) <= 16)
      }
      val (w0, h0) = Multimodal.AviCodec.synthDims(r.doc_id)
      val scale = math.min(1.0, 16.0 / math.max(w0, h0))
      assert(r.width == math.max(1, (w0 * scale).toInt))
      assert(r.height == math.max(1, (h0 * scale).toInt))
      // nearest-neighbor: corner pixel of frame 0 is source pixel (0,0)
      assert((back(0).getRGB(0, 0) & 0xffffff) ==
        Multimodal.AviCodec.synthPixel(r.doc_id, 0, 0, 0))
    }
  }

  test("sampled frames are standalone decodable PNGs of the right frame") {
    val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))
      .filter($"kind" === "video").limit(10)
    val frames = Multimodal.sampleFrames(spark, media, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      val img = Multimodal.ImageIoCodec.decode(fr.payload).get // real PNG payload
      val (w, h) = Multimodal.AviCodec.synthDims(fr.doc_id)
      assert(img.getWidth == w && img.getHeight == h)
      // the payload is the FRAME AT THAT INDEX, not just any frame
      assert((img.getRGB(1, 1) & 0xffffff) ==
        Multimodal.AviCodec.synthPixel(fr.doc_id, fr.frame_idx, 1, 1))
    }
  }
}
