package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column support (builder north star): image/audio/video
  * travel as opaque `binary` columns with typed metadata structs;
  * decode / resize / feature-extract / frame-sample run as
  * per-partition kernels (`mapPartitions` — the Scala analog of a
  * batched pandas UDF: one decoder handle per partition, iterator in
  * / iterator out, no per-row setup).
  *
  * The actual codec is STUBBED behind `MediaDecoder` — real image
  * and audio libraries are unavailable in this environment — but the
  * Spark-side contract (schemas, partition batching, deterministic
  * output) is real and tested. `FakeDecoder` derives pixels
  * deterministically from the bytes, so downstream geometry/feature
  * code paths execute for real.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String,
      content: Array[Byte])

  final case class RawImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    def pixel(x: Int, y: Int, c: Int): Int =
      pixels((y * width + x) * channels + c) & 0xFF
  }

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_luma: Double, embedding: Array[Float])

  final case class VideoFrames(doc_id: Long, n_frames: Int,
      sampled: Seq[Long]) // frame fingerprints of every k-th frame

  /** The pluggable codec boundary — a real implementation would wrap
    * javax.imageio / ffmpeg here.
    */
  trait MediaDecoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): RawImage
    def videoFrameCount(bytes: Array[Byte]): Int
    def decodeFrame(bytes: Array[Byte], idx: Int): RawImage
  }

  /** Deterministic stand-in codec: an 8×8 RGB image whose pixels are
    * a rolling function of the payload bytes; "videos" have
    * length/4096+1 frames keyed by (payload, frame idx).
    */
  final case class FakeDecoder() extends MediaDecoder {
    private def mix(bytes: Array[Byte], seed: Int): Long = {
      var h = 1125899906842597L + seed
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
    def decodeImage(bytes: Array[Byte]): RawImage =
      imageFrom(mix(bytes, 0))
    def videoFrameCount(bytes: Array[Byte]): Int =
      bytes.length / 4096 + 1
    def decodeFrame(bytes: Array[Byte], idx: Int): RawImage =
      imageFrom(mix(bytes, idx + 1))
    private def imageFrom(seed: Long): RawImage = {
      val w = 8; val h = 8; val c = 3
      val px = new Array[Byte](w * h * c)
      var s = seed
      var i = 0
      while (i < px.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        px(i) = (s >>> 56).toByte
        i += 1
      }
      RawImage(w, h, c, px)
    }
  }

  /** Nearest-neighbor resize — real geometry code over the decoded
    * pixel buffer (no stub here).
    */
  def resize(img: RawImage, w: Int, h: Int): RawImage = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    RawImage(w, h, img.channels, out)
  }

  /** Channel-mean + 2×2-block luma grid as a small embedding — the
    * real feature math over decoded pixels.
    */
  def features(img: RawImage): (Double, Array[Float]) = {
    var luma = 0.0
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = img.pixels(i * img.channels) & 0xFF
      val g = img.pixels(i * img.channels + 1) & 0xFF
      val b = img.pixels(i * img.channels + 2) & 0xFF
      luma += 0.299 * r + 0.587 * g + 0.114 * b
      i += 1
    }
    val small = resize(img, 2, 2)
    val emb = Array.tabulate(4) { j =>
      val x = j % 2; val y = j / 2
      (0.299 * small.pixel(x, y, 0) + 0.587 * small.pixel(x, y, 1) +
        0.114 * small.pixel(x, y, 2)).toFloat
    }
    (luma / n, emb)
  }

  /** Batched image decode + resize + feature extraction: one decoder
    * per partition, schema (doc_id, width, height, channels,
    * mean_luma, embedding float[4]).
    */
  def imageFeatures(media: Dataset[MediaRow], decoder: MediaDecoder,
      targetW: Int = 8, targetH: Int = 8): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // decoder handle amortized across the partition (model-load
      // analog of the pandas-UDF batch)
      val d = decoder
      it.filter(_.media_type == "image").map { m =>
        val img = resize(d.decodeImage(m.content), targetW, targetH)
        val (luma, emb) = features(img)
        ImageFeatures(m.doc_id, img.width, img.height, img.channels,
          luma, emb)
      }
    }
  }

  /** Every-k-th frame sampling with per-frame fingerprints. */
  def sampleFrames(media: Dataset[MediaRow], decoder: MediaDecoder,
      everyK: Int): Dataset[VideoFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.filter(_.media_type == "video").map { m =>
        val n = d.videoFrameCount(m.content)
        val sampled = (0 until n by everyK).map { f =>
          val img = d.decodeFrame(m.content, f)
          img.pixels.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
        }
        VideoFrames(m.doc_id, n, sampled)
      }
    }
  }
}
