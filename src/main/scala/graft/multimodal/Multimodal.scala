package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column support (builder north star): image/audio/video
  * travel as opaque `binary` columns with typed metadata structs;
  * decode / resize / feature-extract / frame-sample run as
  * per-partition kernels (`mapPartitions` — the Scala analog of a
  * batched pandas UDF: one decoder handle per partition, iterator in
  * / iterator out, no per-row setup).
  *
  * The codec boundary is the pluggable `MediaDecoder` trait. The
  * production implementation ([[Multimodal.BinaryImageDecoder]]) is a
  * REAL pure-JVM codec: BMP/PPM stills ([[Multimodal.ImageCodec]])
  * and Y4M raw-video streams ([[Multimodal.Y4mCodec]]). `FakeDecoder`
  * remains as a deterministic stand-in for specs that only exercise
  * the Spark-side plumbing (schemas, partition batching).
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

  /** REAL pure-JVM video container — Y4M (YUV4MPEG2), the raw-video
    * interchange format every ffmpeg pipeline can emit: one ASCII
    * header line (`YUV4MPEG2 W.. H.. F..:.. [Ip] [A..] [C444|C420*|
    * Cmono] [X..]`), then per frame an ASCII `FRAME[ params]` marker
    * line followed by the raw planar pixel data. Same upgrade the BMP/
    * PPM work gave stills: the multimodal video path is a genuine
    * container walk (header grammar, frame stride, plane layout)
    * instead of a fabricated frame count.
    */
  object Y4mCodec {
    final case class Header(width: Int, height: Int, colorspace: String,
        dataStart: Int) {
      /** Raw bytes per frame for the declared plane layout. */
      def frameBytes: Int = colorspace match {
        case c if c.startsWith("C444") => width * height * 3
        case c if c.startsWith("C420") =>
          width * height + chromaW * chromaH * 2
        case "Cmono" => width * height
        case c => throw new IllegalArgumentException(
          s"unsupported Y4M colorspace $c")
      }
      def channels: Int = if (colorspace == "Cmono") 1 else 3
      // ceil halves: the 4:2:0 chroma planes (odd dims round up, the
      // mapping below is plain nearest-neighbor x/2, y/2)
      def chromaW: Int = (width + 1) / 2
      def chromaH: Int = (height + 1) / 2
    }

    def isY4m(bytes: Array[Byte]): Boolean =
      bytes.length >= 9 &&
        new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2"

    /** Parse the stream header line. Loud on anything malformed —
      * same reject philosophy as decodeWav/decodeBmp.
      */
    def parseHeader(bytes: Array[Byte]): Header = {
      require(isY4m(bytes), "not a YUV4MPEG2 stream")
      var eol = 9
      while (eol < bytes.length && bytes(eol) != '\n') eol += 1
      require(eol < bytes.length, "Y4M header line unterminated")
      val params = new String(bytes, 9, eol - 9, "US-ASCII")
        .split(' ').filter(_.nonEmpty)
      var w = -1; var h = -1; var cs = "C420" // C420 is the spec default
      params.foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'C' => cs = p
          case _ => // F (rate), I (interlace), A (aspect), X (extension)
        }
      }
      require(w > 0 && h > 0, s"bad Y4M dims ${w}x$h")
      Header(w, h, cs, eol + 1)
    }

    /** Byte offsets of each frame's pixel data (after its FRAME
      * marker line, which may carry parameters).
      */
    def frameOffsets(bytes: Array[Byte]): Seq[Int] = {
      val hdr = parseHeader(bytes)
      val offs = Seq.newBuilder[Int]
      var pos = hdr.dataStart
      while (pos < bytes.length) {
        require(pos + 5 <= bytes.length &&
          new String(bytes, pos, 5, "US-ASCII") == "FRAME",
          s"expected FRAME marker at byte $pos")
        var eol = pos + 5
        while (eol < bytes.length && bytes(eol) != '\n') eol += 1
        require(eol < bytes.length, "FRAME marker line unterminated")
        require(eol + 1 + hdr.frameBytes <= bytes.length,
          s"Y4M frame at byte $pos truncated")
        offs += eol + 1
        pos = eol + 1 + hdr.frameBytes
      }
      offs.result()
    }

    def frameCount(bytes: Array[Byte]): Int = frameOffsets(bytes).size

    /** Decode frame `idx` to an interleaved raster: 3-channel Y,U,V
      * per pixel (C444 direct; C420 nearest-neighbor chroma upsample)
      * or 1-channel luma for Cmono. No RGB conversion — that's a
      * lossy colorimetry choice downstream feature code can make; the
      * container's own planes stay exact.
      */
    def decodeFrame(bytes: Array[Byte], idx: Int): RawImage = {
      val hdr = parseHeader(bytes)
      val offs = frameOffsets(bytes)
      require(idx >= 0 && idx < offs.size,
        s"frame $idx out of range (${offs.size} frames)")
      val o = offs(idx)
      val w = hdr.width; val h = hdr.height; val n = w * h
      hdr.colorspace match {
        case "Cmono" =>
          RawImage(w, h, 1, java.util.Arrays.copyOfRange(bytes, o, o + n))
        case c if c.startsWith("C444") =>
          val px = new Array[Byte](n * 3)
          var p = 0
          while (p < n) {
            px(p * 3) = bytes(o + p)             // Y plane
            px(p * 3 + 1) = bytes(o + n + p)     // U plane
            px(p * 3 + 2) = bytes(o + 2 * n + p) // V plane
            p += 1
          }
          RawImage(w, h, 3, px)
        case _ => // C420 family (jpeg/mpeg2/paldv share the layout)
          val cw = hdr.chromaW; val ch = hdr.chromaH
          val px = new Array[Byte](n * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = y * w + x
              val cp = (y / 2) * cw + (x / 2)
              px(p * 3) = bytes(o + p)
              px(p * 3 + 1) = bytes(o + n + cp)
              px(p * 3 + 2) = bytes(o + n + cw * ch + cp)
              x += 1
            }
            y += 1
          }
          RawImage(w, h, 3, px)
      }
    }

    /** Planar frames → Y4M stream (inverse of [[decodeFrame]] up to
      * chroma subsampling); specs round-trip both directions.
      */
    def encode(frames: Seq[RawImage], colorspace: String = "C444")
        : Array[Byte] = {
      require(frames.nonEmpty, "encode wants at least one frame")
      val w = frames.head.width; val h = frames.head.height
      require(frames.forall(f => f.width == w && f.height == h),
        "all frames must share dimensions")
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $colorspace\n"
        .getBytes("US-ASCII"))
      frames.foreach { f =>
        out.write("FRAME\n".getBytes("US-ASCII"))
        colorspace match {
          case "Cmono" =>
            require(f.channels == 1, "Cmono wants 1-channel frames")
            out.write(f.pixels)
          case "C444" =>
            require(f.channels == 3, "C444 wants 3-channel frames")
            var c = 0
            while (c < 3) {
              var p = 0
              while (p < w * h) { out.write(f.pixels(p * 3 + c)); p += 1 }
              c += 1
            }
          case _ => // C420: subsample chroma at the even grid points
            require(f.channels == 3, "C420 wants 3-channel frames")
            var p = 0
            while (p < w * h) { out.write(f.pixels(p * 3)); p += 1 }
            val cw = (w + 1) / 2; val chh = (h + 1) / 2
            var c = 1
            while (c < 3) {
              var cy = 0
              while (cy < chh) {
                var cx = 0
                while (cx < cw) {
                  out.write(f.pixels(((cy * 2) * w + cx * 2) * 3 + c))
                  cx += 1
                }
                cy += 1
              }
              c += 1
            }
        }
      }
      out.toByteArray
    }
  }

  /** The real codec behind [[MediaDecoder]]: BMP/PPM stills and Y4M
    * video streams (magic-sniffed); a non-Y4M payload on the video
    * path is treated as a single still frame.
    */
  final case class BinaryImageDecoder() extends MediaDecoder {
    def decodeImage(bytes: Array[Byte]): RawImage =
      if (Y4mCodec.isY4m(bytes)) Y4mCodec.decodeFrame(bytes, 0)
      else ImageCodec.decode(bytes)
    def videoFrameCount(bytes: Array[Byte]): Int =
      if (Y4mCodec.isY4m(bytes)) Y4mCodec.frameCount(bytes) else 1
    def decodeFrame(bytes: Array[Byte], idx: Int): RawImage =
      if (Y4mCodec.isY4m(bytes)) Y4mCodec.decodeFrame(bytes, idx)
      else {
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

  final case class FrameStats(doc_id: Long, n_frames: Int,
      n_sampled: Int, sum_y: Long, sum_u: Long, sum_v: Long)

  /** Every-k-th frame sampling with EXACT per-plane integer sums over
    * the sampled frames — the oracle-exact video twin of
    * [[imageStats]]: a header-grammar, frame-stride or plane-order
    * bug in the codec breaks the sums. Single-channel frames
    * contribute to sum_y only.
    */
  def frameStats(media: Dataset[MediaRow], decoder: MediaDecoder,
      everyK: Int): Dataset[FrameStats] = {
    require(everyK > 0, s"need everyK > 0, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.filter(_.media_type == "video").map { m =>
        val n = d.videoFrameCount(m.content)
        var sy = 0L; var su = 0L; var sv = 0L; var sampled = 0
        var f = 0
        while (f < n) {
          val img = d.decodeFrame(m.content, f)
          val np = img.width * img.height
          var p = 0
          while (p < np) {
            sy += img.pixels(p * img.channels) & 0xFF
            if (img.channels >= 3) {
              su += img.pixels(p * img.channels + 1) & 0xFF
              sv += img.pixels(p * img.channels + 2) & 0xFF
            }
            p += 1
          }
          sampled += 1
          f += everyK
        }
        FrameStats(m.doc_id, n, sampled, sy, su, sv)
      }
    }
  }

  /** The pHash DCT basis, quantized to exact integers:
    * C(u,x) = round(cos(π(2x+1)u/64)·2¹⁴). 2¹⁴ keeps the two-pass
    * fold inside a Long (luma ≤ 255000 → pass-1 ≤ 1.4e11 → pass-2 ≤
    * 7e16 < 2⁶³) while quantization error (~6e-5 relative) is far
    * below the median-threshold decision margins. The 256 integers
    * are the CONTRACT — [[phashCosSqlValues]] inlines them into the
    * DuckDB oracle as literals so no libm enters either engine's
    * hash path.
    */
  val PhashCosScale = 16384L
  lazy val phashCos: Array[Array[Long]] = Array.tabulate(8, 32)((u, x) =>
    Math.round(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 16384.0))

  /** `(u, x, c)` VALUES rows for the oracle's cos-table CTE. */
  def phashCosSqlValues: String =
    (for (u <- 0 until 8; x <- 0 until 32)
      yield s"($u,$x,${phashCos(u)(x)})").mkString(",")

  /** X157 — DCT perceptual hash (pHash): luma → 32×32 resample →
    * separable 2D DCT-II → 8×8 low-frequency block → 64-bit signature
    * (bit i set iff coefficient i exceeds the median of the 63 non-DC
    * coefficients — 63 is odd, so the median is an exact element, no
    * averaging). Near-identical images — recompressed, lightly
    * cropped, brightness-tweaked — land within a few Hamming bits;
    * content-different images land ~32 apart. EXACT-INTEGER
    * arithmetic end to end (r13): luma on the ×1000 grid
    * (299R+587G+114B), DCT via the pinned [[phashCos]] integer
    * basis, integer median — so the hash is a pure integer function
    * of the pixels and the q_phash oracles replay it verbatim in
    * SQL (the q_hopkins/q_geo_median integer-construction
    * precedent).
    */
  def phash(img: RawImage): Long = {
    val n = 32
    val small = resize(img, n, n)
    val g = new Array[Long](n * n)
    var i = 0
    while (i < n * n) {
      g(i) = 299L * (small.pixels(i * small.channels) & 0xFF) +
        587L * (small.pixels(i * small.channels +
          math.min(1, small.channels - 1)) & 0xFF) +
        114L * (small.pixels(i * small.channels +
          math.min(2, small.channels - 1)) & 0xFF)
      i += 1
    }
    // separable DCT-II, only the first 8 output frequencies per axis
    val k = 8
    val cosTab = phashCos
    val rows = Array.ofDim[Long](n, k) // DCT along x, per row y
    var y = 0
    while (y < n) {
      var u = 0
      while (u < k) {
        var s = 0L
        var x = 0
        while (x < n) { s += g(y * n + x) * cosTab(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Long](k * k) // then DCT along y
    var v = 0
    while (v < k) {
      var u = 0
      while (u < k) {
        var s = 0L
        var yy = 0
        while (yy < n) { s += rows(yy)(u) * cosTab(v)(yy); yy += 1 }
        coef(v * k + u) = s
        u += 1
      }
      v += 1
    }
    val med = coef.drop(1).sorted.apply(31) // median of 63 non-DC
    var h = 0L
    i = 0
    while (i < 64) {
      if (coef(i) > med) h |= 1L << i
      i += 1
    }
    h
  }

  /** Batched decode → (doc_id, phash) — the image analog of the X1
    * content-hash pass, feeding [[graft.operators.Dedup.hammingPairs]]
    * banded near-dup candidate generation.
    */
  def phashes(media: Dataset[MediaRow], decoder: MediaDecoder)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.filter(_.media_type == "image")
        .map(m => (m.doc_id, phash(d.decodeImage(m.content))))
    }.toDF("doc_id", "phash")
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
