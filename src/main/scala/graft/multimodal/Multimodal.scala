package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct alongside. The
  * Spark-side mechanics — schema, per-partition batched processing,
  * deterministic output — are real; the codec itself is a STUB
  * (`FakeCodec`) because no image/audio libraries ship in this
  * container. Swapping in a real decoder means replacing one pure
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
    * purely from the payload bytes. Stands in for e.g. a JPEG decode +
    * resize + patch-embed step.
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

  /** Attach a binary payload column (here synthesized from text —
    * UTF-8 bytes standing in for media bytes) plus a kind tag. In a
    * real pipeline this is the ingest step reading blob files.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      // null text ⇒ empty payload, not a null that NPEs the codec
      encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))

  /** A null binary payload (nullable source column) is an empty media
    * blob, never an NPE inside a task — every operator below
    * normalizes through this before touching codec/payload methods.
    */
  private def safePayload(p: Array[Byte]): Array[Byte] =
    if (p == null) Array.emptyByteArray else p

  /** Per-partition batched decode + feature extraction. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-task codec init would go here (native contexts, models…)
      rows.map { r =>
        val payload = safePayload(r.payload)
        val (w, h, f) = FakeCodec.decode(r.kind, payload)
        MediaFeatures(r.doc_id, r.kind, payload.length.toLong, w, h, f,
          FakeCodec.features(payload))
      }
    }
  }

  case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize-to-fit stub: computes the real target geometry (aspect-
    * preserving fit into maxSide) and re-encodes the payload with the
    * fake codec (truncate-to-proportional-size stands in for actual
    * pixel resampling). The Spark mechanics — binary in/binary out,
    * partition-batched, narrow — are the production shape.
    */
  def resize(spark: SparkSession, media: DataFrame, maxSide: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val payload = safePayload(r.payload)
      val (w, h, _) = FakeCodec.decode(r.kind, payload)
      val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
      val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      val nBytes = math.max(1, (payload.length * scale * scale).toInt)
      ResizedMedia(r.doc_id, r.kind, nw, nh, payload.take(nBytes))
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
