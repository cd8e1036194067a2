package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct alongside. The
  * Spark-side mechanics — schema, per-partition batched processing,
  * deterministic output — are real. Codecs are pluggable: IMAGE rows
  * carry real PNG payloads and decode through `javax.imageio`
  * (JDK-only — [[ImageIoCodec]]: true pixel geometry, real Java2D
  * resampling on resize); AUDIO rows carry real WAV PCM payloads and
  * decode through `javax.sound.sampled` (JDK-only — [[WavCodec]]:
  * real RIFF header parse, exact integer samples). Only VIDEO remains
  * behind the deterministic [[FakeCodec]] stub, because neither the
  * JDK nor this container ships any video container/codec library.
  * Swapping the stub for a real decoder means replacing one pure
  * function; the distributed plumbing does not change.
  *
  * Scale notes: decode runs inside `mapPartitions`, so per-partition
  * codec state (a real decoder's native context) is initialized once
  * per task, not once per row; payload bytes never shuffle — features
  * are extracted before any wide operation.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Deterministic fake codec: derives plausible media properties
    * purely from the payload bytes. After round 5 only VIDEO rows use
    * it (image → [[ImageIoCodec]], audio → [[WavCodec]]): video is the
    * one modality with no JDK decode path and no codec library in this
    * container, so it stands in for a demux + frame-decode step.
    */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
      val width = 64 + math.floorMod(h, 1024).toInt
      val height = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = kind match {
        case "video" => 1 + math.floorMod(h >> 20, 300).toInt
        case "audio" => 1 + math.floorMod(h >> 20, 48000).toInt
        case _ => 1
      }
      (width, height, frames)
    }

    /** Fake 8-dim feature vector from rolling byte statistics. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Real JDK-only audio codec over WAV PCM payloads:
    * `javax.sound.sampled` for both synthesis (AudioSystem.write of a
    * 16-bit signed mono stream) and decode (AudioSystem
    * .getAudioInputStream parses the RIFF/fmt chunks — sample rate,
    * channel count and sample width come from the REAL header, not
    * from our formula). Samples are integers end to end, so decode
    * correctness is provable by exact sums, same contract as
    * [[ImageIoCodec]]/q_image_decode. Undecodable payloads degrade to
    * None — a bad blob is data, not an error.
    */
  object WavCodec {
    val SampleRate = 8000f

    /** The sample formula [[synthesize]] encodes — pure integer
      * arithmetic in (docId, i) so a DuckDB oracle can recompute the
      * decoded sums without any audio library (q_audio_decode).
      */
    def synthSample(docId: Long, i: Int): Short =
      ((docId * 131L + i * 7919L) % 65536L - 32768L).toShort

    /** Sample count for `docId` — bounded so the oracle's range()
      * cross join stays small at every SF.
      */
    def synthNumSamples(docId: Long): Int = (160 + docId % 640).toInt

    /** Encode 16-bit mono samples as a WAV payload through the real
      * `AudioSystem.write` WAVE encoder (genuine RIFF header; decode
      * does not get to cheat).
      */
    def encode(rate: Float, samples: Array[Short]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Deterministic synthetic WAV for `docId`: 16-bit signed
      * little-endian mono PCM at 8 kHz.
      */
    def synthesize(docId: Long): Array[Byte] =
      encode(SampleRate,
        Array.tabulate(synthNumSamples(docId))(i => synthSample(docId, i)))

    /** Decode a WAV payload to (sampleRate, 16-bit samples of channel
      * 0). Returns None for non-WAV / corrupt / non-16-bit payloads.
      */
    def decode(payload: Array[Byte]): Option[(Float, Array[Short])] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val frameSize = fmt.getFrameSize // channels * 2 bytes
          val n = bytes.length / frameSize
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            val o = i * frameSize // channel 0 of the frame
            out(i) =
              if (fmt.isBigEndian)
                (((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)).toShort
              else
                (((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)).toShort
            i += 1
          }
          Some((fmt.getSampleRate, out))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** 8-dim feature: mean normalized amplitude of 8 equal time
      * segments — real sample statistics, the audio twin of
      * [[ImageIoCodec.features]]'s quadrant luminance.
      */
    def features(samples: Array[Short]): Array[Float] = {
      val out = new Array[Double](8)
      val cnt = new Array[Long](8)
      val n = samples.length
      var i = 0
      while (i < n) {
        val seg = (i.toLong * 8 / math.max(n, 1)).toInt
        out(seg) += math.abs(samples(i).toDouble) / 32768.0
        cnt(seg) += 1
        i += 1
      }
      Array.tabulate(8)(s => (if (cnt(s) > 0) out(s) / cnt(s) else 0.0).toFloat)
    }
  }

  /** Real JDK-only image codec over PNG payloads: `javax.imageio`
    * decode (actual pixel geometry), per-region pixel statistics as
    * the feature vector, and Java2D nearest-neighbor resampling for
    * resize (deterministic: pure software raster, no native paths).
    * Corrupt/undecodable payloads degrade to (0, 0, 0) + empty
    * features instead of failing the task — at corpus scale a bad
    * blob is data, not an error.
    */
  object ImageIoCodec {
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload.isEmpty) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))

    /** 8-dim feature: mean luminance of the 4 quadrants, mean R/G/B,
      * aspect ratio — real pixel statistics, cheap and deterministic.
      */
    def features(img: java.awt.image.BufferedImage): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val quad = new Array[Double](4)
      val quadN = new Array[Long](4)
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quad(q) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          quadN(q) += 1
          sr += r / 255.0; sg += g / 255.0; sb += b / 255.0
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(
        (if (quadN(0) > 0) quad(0) / quadN(0) else 0.0).toFloat,
        (if (quadN(1) > 0) quad(1) / quadN(1) else 0.0).toFloat,
        (if (quadN(2) > 0) quad(2) / quadN(2) else 0.0).toFloat,
        (if (quadN(3) > 0) quad(3) / quadN(3) else 0.0).toFloat,
        (if (n > 0) sr / n else 0.0).toFloat,
        (if (n > 0) sg / n else 0.0).toFloat,
        (if (n > 0) sb / n else 0.0).toFloat,
        if (h > 0) w.toFloat / h else 0f)
    }

    /** Aspect-preserving nearest-neighbor resample, re-encoded PNG. */
    def resize(img: java.awt.image.BufferedImage, maxSide: Int): (Int, Int, Array[Byte]) = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
      val nw = math.max(1, (img.getWidth * scale).toInt)
      val nh = math.max(1, (img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) { // hand-rolled NN sampling: bit-deterministic on any JVM
        var x = 0
        while (x < nw) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / nw, y * img.getHeight / nh))
          x += 1
        }
        y += 1
      }
      (nw, nh, encodePng(out))
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic synthetic PNG for `docId`: geometry and pixel
      * pattern are pure functions of the id — the test fixture
      * generator for the real decode path.
      */
    def synthesize(docId: Long): Array[Byte] = {
      val (w, h) = synthDims(docId)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = (docId * 31 + x * 7 + y * 13) & 0xffffffL
          img.setRGB(x, y, v.toInt)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** The geometry [[synthesize]] uses — tests assert the decoded
      * dimensions equal THIS, proving real pixel geometry flows.
      */
    def synthDims(docId: Long): (Int, Int) =
      (16 + math.floorMod(docId, 48).toInt, 16 + math.floorMod(docId / 7, 48).toInt)
  }

  /** Attach a binary payload column plus a kind tag. IMAGE rows carry
    * real synthetic PNGs (decoded downstream by [[ImageIoCodec]]) and
    * AUDIO rows real synthetic WAVs ([[WavCodec]]); only VIDEO
    * payloads are synthesized from text bytes and stay on the stub
    * codec — no video container/codec library ships in the JDK or
    * this container. In a real pipeline this is the ingest step
    * reading blob files.
    */
  def asMedia(docs: DataFrame): DataFrame = {
    val png = udf((id: Long) => ImageIoCodec.synthesize(id))
    val wav = udf((id: Long) => WavCodec.synthesize(id))
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      // null text ⇒ empty payload, not a null that NPEs the codec
      encode(coalesce(col("text"), lit("")), "UTF-8").as("text_bytes"))
      .select(col("doc_id"), col("kind"),
        when(col("kind") === "image", png(col("doc_id")))
          .when(col("kind") === "audio", wav(col("doc_id")))
          .otherwise(col("text_bytes")).as("payload"))
  }

  /** A null binary payload (nullable source column) is an empty media
    * blob, never an NPE inside a task — every operator below
    * normalizes through this before touching codec/payload methods.
    */
  private def safePayload(p: Array[Byte]): Array[Byte] =
    if (p == null) Array.emptyByteArray else p

  case class PixelSums(doc_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL-decode correctness surface: `javax.imageio` decode of each
    * image payload, then exact integer per-channel pixel sums — no
    * floating point anywhere, so the result is bit-identical to any
    * other correct decoder. The synthetic PNGs are pure arithmetic in
    * (doc_id, x, y) and PNG is lossless, which makes these sums
    * SQL-expressible: the DuckDB oracle recomputes them from the
    * formula without decoding anything (q_image_decode). Undecodable
    * payloads degrade to all-zero sums, same policy as
    * [[extractFeatures]].
    */
  def decodePixelSums(spark: SparkSession, media: DataFrame): Dataset[PixelSums] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        ImageIoCodec.decode(safePayload(r.payload)) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                x += 1
              }
              y += 1
            }
            PixelSums(r.doc_id, w.toLong, h.toLong, sr, sg, sb)
          case None => PixelSums(r.doc_id, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  case class AudioSums(doc_id: Long, sample_rate: Long, n_samples: Long,
      sum_samples: Long, sum_abs: Long)

  /** REAL-decode correctness surface for audio, the WAV twin of
    * [[decodePixelSums]]: `javax.sound.sampled` decode of each audio
    * payload (sample rate read from the actual RIFF header), then
    * exact integer sample sums — no floating point, bit-identical to
    * any correct decoder. The synthetic WAVs are pure arithmetic in
    * (doc_id, i) and PCM is lossless, so the DuckDB oracle recomputes
    * the sums from [[WavCodec.synthSample]]'s formula without decoding
    * anything (q_audio_decode). Undecodable payloads degrade to
    * all-zero sums, same policy as [[extractFeatures]].
    */
  def decodeSampleSums(spark: SparkSession, media: DataFrame): Dataset[AudioSums] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        WavCodec.decode(safePayload(r.payload)) match {
          case Some((rate, samples)) =>
            var s = 0L; var a = 0L
            var i = 0
            while (i < samples.length) {
              s += samples(i); a += math.abs(samples(i).toLong)
              i += 1
            }
            AudioSums(r.doc_id, rate.toLong, samples.length.toLong, s, a)
          case None => AudioSums(r.doc_id, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Per-partition batched decode + feature extraction. Image rows go
    * through the REAL `javax.imageio` decode and audio rows the REAL
    * `javax.sound.sampled` WAV decode (width/height carry sample rate
    * and channel count; n_frames the sample count); only video stays
    * on the stub — no video codec exists in the JDK or this container.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-task codec init would go here (native contexts, models…)
      rows.map { r =>
        val payload = safePayload(r.payload)
        if (r.kind == "image") {
          ImageIoCodec.decode(payload) match {
            case Some(img) =>
              MediaFeatures(r.doc_id, r.kind, payload.length.toLong,
                img.getWidth, img.getHeight, 1, ImageIoCodec.features(img))
            case None => // corrupt blob: degrade, don't fail the task
              MediaFeatures(r.doc_id, r.kind, payload.length.toLong,
                0, 0, 0, Array.empty[Float])
          }
        } else if (r.kind == "audio") {
          WavCodec.decode(payload) match {
            case Some((rate, samples)) =>
              MediaFeatures(r.doc_id, r.kind, payload.length.toLong,
                rate.toInt, 1, samples.length, WavCodec.features(samples))
            case None =>
              MediaFeatures(r.doc_id, r.kind, payload.length.toLong,
                0, 0, 0, Array.empty[Float])
          }
        } else {
          val (w, h, f) = FakeCodec.decode(r.kind, payload)
          MediaFeatures(r.doc_id, r.kind, payload.length.toLong, w, h, f,
            FakeCodec.features(payload))
        }
      }
    }
  }

  case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize-to-fit: image rows are REALLY resampled (nearest-neighbor
    * Java2D, re-encoded PNG — the output payload decodes to the new
    * geometry); audio rows are REALLY clipped (first `maxSide` samples
    * re-encoded through the WAVE encoder — the output payload decodes
    * to the new sample count; width carries it, height the channel
    * count); video keeps the stub (real target geometry,
    * truncate-to-proportional-size standing in for resampling). The
    * Spark mechanics — binary in/binary out, partition-batched,
    * narrow — are the production shape for all three.
    */
  def resize(spark: SparkSession, media: DataFrame, maxSide: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val payload = safePayload(r.payload)
      def stub: ResizedMedia = {
        val (w, h, _) = FakeCodec.decode(r.kind, payload)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val nBytes = math.max(1, (payload.length * scale * scale).toInt)
        ResizedMedia(r.doc_id, r.kind, nw, nh, payload.take(nBytes))
      }
      if (r.kind == "image") ImageIoCodec.decode(payload) match {
        case Some(img) =>
          val (nw, nh, bytes) = ImageIoCodec.resize(img, maxSide)
          ResizedMedia(r.doc_id, r.kind, nw, nh, bytes)
        case None => stub
      }
      else if (r.kind == "audio") WavCodec.decode(payload) match {
        case Some((rate, samples)) =>
          val clipped = samples.take(maxSide)
          ResizedMedia(r.doc_id, r.kind, clipped.length, 1,
            WavCodec.encode(rate, clipped))
        case None => stub
      }
      else stub
    })
  }

  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame sampling for video rows: every `stride`-th frame index up
    * to the decoded frame count, 1 output row per sampled frame
    * (flatMap shape — the row explosion happens BEFORE any shuffle,
    * so downstream per-frame ops parallelize by frame).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(stride >= 1)
    media.as[MediaRow].filter((r: MediaRow) => r.kind == "video")
      .mapPartitions(_.flatMap { r =>
        val payload = safePayload(r.payload)
        val (_, _, frames) = FakeCodec.decode(r.kind, payload)
        (0 until frames by stride).map { i =>
          // stub frame payload: deterministic slice keyed by frame idx
          val off = if (payload.isEmpty) 0 else math.floorMod(i * 31, payload.length)
          Frame(r.doc_id, i, payload.drop(off).take(64))
        }
      })
  }
}
