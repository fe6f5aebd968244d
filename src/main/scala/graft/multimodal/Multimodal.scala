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

  /** REAL pure-JVM image codec — BMP (24-bit uncompressed,
    * BITMAPINFOHEADER, bottom-up rows, BGR, 4-byte row padding) and
    * binary PPM (P6, maxval 255). No external libraries: ~80 lines of
    * byte parsing, enough to make the multimodal path a genuine
    * container round-trip (the same upgrade [[graft.sources.Sources]]
    * decodeWav gave audio) instead of a fabricated-pixel stub.
    */
  object ImageCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

    /** Magic-sniffing decode: BM → BMP, P6 → PPM; anything else is a
      * loud failure (mirrors decodeWav's reject philosophy).
      */
    def decode(bytes: Array[Byte]): RawImage = {
      require(bytes.length >= 2, "image payload too short")
      if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
      else throw new IllegalArgumentException(
        s"unsupported image container (magic ${bytes(0)},${bytes(1)})")
    }

    /** 24-bit uncompressed BMP → top-down RGB raster. */
    def decodeBmp(bytes: Array[Byte]): RawImage = {
      require(bytes.length >= 54, "BMP truncated before headers")
      val dataOffset = i32(bytes, 10)
      val w = i32(bytes, 18)
      val h = i32(bytes, 22)
      val bpp = u16(bytes, 28)
      val compression = i32(bytes, 30)
      require(w > 0 && h != 0, s"bad BMP dims ${w}x$h")
      require(bpp == 24, s"only 24-bit BMP supported, got $bpp bpp")
      require(compression == 0, s"compressed BMP ($compression) unsupported")
      val bottomUp = h > 0
      val height = math.abs(h)
      val rowBytes = (w * 3 + 3) / 4 * 4 // rows pad to 4-byte multiples
      require(bytes.length >= dataOffset + rowBytes * height,
        "BMP pixel data truncated")
      val px = new Array[Byte](w * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        val src = dataOffset + srcRow * rowBytes
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          px(o) = bytes(src + x * 3 + 2)     // R (stored BGR)
          px(o + 1) = bytes(src + x * 3 + 1) // G
          px(o + 2) = bytes(src + x * 3)     // B
          x += 1
        }
        y += 1
      }
      RawImage(w, height, 3, px)
    }

    /** Binary PPM (P6): ASCII header (whitespace + '#' comments),
      * maxval 255, then top-down RGB rows.
      */
    def decodePpm(bytes: Array[Byte]): RawImage = {
      var pos = 2 // past "P6"
      def nextInt(): Int = {
        while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#')
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = 0
        require(pos < bytes.length && bytes(pos).toChar.isDigit,
          "malformed PPM header")
        while (pos < bytes.length && bytes(pos).toChar.isDigit) {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      require(w > 0 && h > 0, s"bad PPM dims ${w}x$h")
      require(maxval == 255, s"only maxval 255 PPM supported, got $maxval")
      pos += 1 // the single whitespace after maxval
      require(bytes.length >= pos + w * h * 3, "PPM pixel data truncated")
      RawImage(w, h, 3, java.util.Arrays.copyOfRange(bytes, pos,
        pos + w * h * 3))
    }

    /** RGB raster → 24-bit bottom-up BMP (the inverse of
      * [[decodeBmp]]); spec round-trips both directions.
      */
    def encodeBmp(img: RawImage): Array[Byte] = {
      require(img.channels == 3, "encodeBmp wants RGB")
      val rowBytes = (img.width * 3 + 3) / 4 * 4
      val size = 54 + rowBytes * img.height
      val out = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      out.putInt(40).putInt(img.width).putInt(img.height)
        .putShort(1).putShort(24).putInt(0).putInt(rowBytes * img.height)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = img.height - 1
      while (y >= 0) {
        var x = 0
        while (x < img.width) {
          val o = (y * img.width + x) * 3
          out.put(img.pixels(o + 2)).put(img.pixels(o + 1))
            .put(img.pixels(o))
          x += 1
        }
        var p = img.width * 3
        while (p < rowBytes) { out.put(0.toByte); p += 1 }
        y -= 1
      }
      out.array()
    }

    /** RGB raster → binary PPM (P6). */
    def encodePpm(img: RawImage): Array[Byte] = {
      require(img.channels == 3, "encodePpm wants RGB")
      val header = s"P6\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      header ++ img.pixels
    }
  }

  /** The real codec behind [[MediaDecoder]]: BMP/PPM stills; a
    * "video" is its single frame (neither container carries frames).
    */
  final case class BinaryImageDecoder() extends MediaDecoder {
    def decodeImage(bytes: Array[Byte]): RawImage =
      ImageCodec.decode(bytes)
    def videoFrameCount(bytes: Array[Byte]): Int = 1
    def decodeFrame(bytes: Array[Byte], idx: Int): RawImage = {
      require(idx == 0, s"still container has one frame, asked for $idx")
      ImageCodec.decode(bytes)
    }
  }

  final case class ImageStats(doc_id: Long, width: Int, height: Int,
      channels: Int, sum_r: Long, sum_g: Long, sum_b: Long,
      mean_luma: Double)

  /** Batched decode → exact integer channel sums (+ mean luma derived
    * from them in one double op chain, so any engine reproduces it
    * bit-for-bit from the sums). Same per-partition decoder-handle
    * shape as [[imageFeatures]]; this is the oracle-exact stats path.
    */
  def imageStats(media: Dataset[MediaRow],
      decoder: MediaDecoder): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.filter(_.media_type == "image").map { m =>
        val img = d.decodeImage(m.content)
        var sr = 0L; var sg = 0L; var sb = 0L
        val n = img.width * img.height
        var i = 0
        while (i < n) {
          sr += img.pixels(i * img.channels) & 0xFF
          sg += img.pixels(i * img.channels + 1) & 0xFF
          sb += img.pixels(i * img.channels + 2) & 0xFF
          i += 1
        }
        val luma = BigDecimal(
          (0.299 * sr + 0.587 * sg + 0.114 * sb) / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        ImageStats(m.doc_id, img.width, img.height, img.channels,
          sr, sg, sb, luma)
      }
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
