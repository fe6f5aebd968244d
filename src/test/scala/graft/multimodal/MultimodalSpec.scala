package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import Multimodal._

/** Multimodal plumbing spec: deterministic fake codec, real resize /
  * feature / sampling math, Spark batching over binary columns.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dec = FakeDecoder()

  test("resize: nearest-neighbor geometry on a known 2x2 image") {
    // 2x2 RGB: quadrant colors
    val px = Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val img = RawImage(2, 2, 3, px)
    val up = resize(img, 4, 4)
    assert(up.width == 4 && up.height == 4)
    assert(up.pixel(0, 0, 0) == 255 && up.pixel(1, 1, 0) == 255) // TL red
    assert(up.pixel(3, 0, 1) == 255 && up.pixel(3, 0, 0) == 0) // TR green
    assert(up.pixel(0, 3, 2) == 255) // BL blue
    assert(up.pixel(3, 3, 0) == 255 && up.pixel(3, 3, 2) == 255) // BR white
    val down = resize(up, 2, 2)
    assert(down.pixels.toSeq == img.pixels.toSeq)
  }

  test("features: luma of uniform white is 255, embedding has 4 dims") {
    val white = RawImage(4, 4, 3, Array.fill(48)(255.toByte))
    val (luma, emb) = features(white)
    assert(math.abs(luma - 255.0) < 0.5)
    assert(emb.length == 4)
    assert(emb.forall(v => math.abs(v - 255.0f) < 0.5f))
  }

  test("imageFeatures: batched decode is deterministic and typed") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      MediaRow(1L, "image", "payload-one".getBytes),
      MediaRow(2L, "image", "payload-two".getBytes),
      MediaRow(3L, "video", "not-an-image".getBytes)).toDS()
    val got = imageFeatures(rows, dec).collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(1L, 2L)) // video filtered
    assert(got.forall(f => f.width == 8 && f.height == 8 && f.channels == 3))
    assert(got.forall(f => f.embedding.length == 4))
    // determinism: same payload → same features across runs
    val again = imageFeatures(rows, dec).collect().sortBy(_.doc_id)
    assert(got.map(_.mean_luma).toSeq == again.map(_.mean_luma).toSeq)
    // different payloads → different features
    assert(got(0).mean_luma != got(1).mean_luma)
  }

  test("sampleFrames: every-k-th frame, deterministic fingerprints") {
    val s = spark
    import s.implicits._
    val vid = MediaRow(9L, "video", Array.fill(4096 * 3 + 1)(7.toByte))
    val got = sampleFrames(Seq(vid).toDS(), dec, everyK = 2).collect()(0)
    assert(got.n_frames == 4)
    assert(got.sampled.length == 2) // frames 0, 2
    val again = sampleFrames(Seq(vid).toDS(), dec, everyK = 2).collect()(0)
    assert(got.sampled == again.sampled)
  }

  private def patternImage(w: Int, h: Int): RawImage =
    RawImage(w, h, 3,
      Array.tabulate(w * h * 3)(i => ((i * 7 + 11) % 256).toByte))

  test("ImageCodec: BMP round-trips every padding residue, golden bytes") {
    // widths 1..8 cover rowBytes padding 0..3; heights exercise
    // bottom-up row reversal
    for (w <- 1 to 8; h <- Seq(1, 2, 5)) {
      val img = patternImage(w, h)
      val back = ImageCodec.decodeBmp(ImageCodec.encodeBmp(img))
      assert(back.width == w && back.height == h && back.channels == 3)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"${w}x$h")
    }
    // golden: a hand-written 2x1 BMP (one red, one green pixel,
    // bottom-up BGR, row padded 6 -> 8 bytes) — catches a symmetric
    // encode/decode bug a round-trip can't see
    val golden = Array[Int](
      'B', 'M', 62, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 255, /* BGR red */ 0, 255, 0, /* BGR green */ 0, 0
    ).map(_.toByte)
    val g = ImageCodec.decodeBmp(golden)
    assert(g.width == 2 && g.height == 1)
    assert(g.pixels.toSeq == Seq[Byte](255.toByte, 0, 0, 0, 255.toByte, 0))
  }

  test("ImageCodec: top-down BMP (negative height) and PPM with comments") {
    val img = patternImage(3, 2)
    // flip the height field negative and re-order rows top-down
    val enc = ImageCodec.encodeBmp(img)
    val td = enc.clone()
    val hNeg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(hNeg, 0, td, 22, 4)
    val rowBytes = (3 * 3 + 3) / 4 * 4
    // swap the two stored rows so top-down order matches
    val r0 = java.util.Arrays.copyOfRange(enc, 54, 54 + rowBytes)
    System.arraycopy(enc, 54 + rowBytes, td, 54, rowBytes)
    System.arraycopy(r0, 0, td, 54 + rowBytes, rowBytes)
    assert(ImageCodec.decodeBmp(td).pixels.toSeq == img.pixels.toSeq)
    // PPM with a header comment round-trips through the sniffer
    val ppm = "P6\n# a comment\n3 2\n255\n".getBytes("US-ASCII") ++
      img.pixels
    val p = ImageCodec.decode(ppm)
    assert(p.width == 3 && p.height == 2 &&
      p.pixels.toSeq == img.pixels.toSeq)
    assert(ImageCodec.decodePpm(ImageCodec.encodePpm(img))
      .pixels.toSeq == img.pixels.toSeq)
  }

  test("ImageCodec: malformed containers fail loudly") {
    intercept[IllegalArgumentException](ImageCodec.decode(
      Array[Byte]('G', 'I', 'F')))
    intercept[IllegalArgumentException](ImageCodec.decode(
      "P6\n2 2\n127\n".getBytes("US-ASCII") ++ new Array[Byte](12)))
    val img = patternImage(2, 2)
    val truncated = ImageCodec.encodeBmp(img).dropRight(5)
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(truncated))
  }

  test("Y4mCodec: C444 and Cmono round-trip exactly; C420 chroma at even grid") {
    val frames = Seq(patternImage(5, 4),
      RawImage(5, 4, 3, Array.tabulate(60)(i => ((i * 13 + 5) % 256).toByte)))
    val c444 = Y4mCodec.encode(frames, "C444")
    assert(Y4mCodec.frameCount(c444) == 2)
    frames.zipWithIndex.foreach { case (f, i) =>
      val back = Y4mCodec.decodeFrame(c444, i)
      assert(back.width == 5 && back.height == 4 && back.channels == 3)
      assert(back.pixels.toSeq == f.pixels.toSeq, s"frame $i")
    }
    // Cmono: single plane, exact
    val mono = Seq(RawImage(3, 3, 1,
      Array.tabulate(9)(i => (i * 29 % 256).toByte)))
    val m = Y4mCodec.encode(mono, "Cmono")
    val mb = Y4mCodec.decodeFrame(m, 0)
    assert(mb.channels == 1 && mb.pixels.toSeq == mono.head.pixels.toSeq)
    // C420 (odd dims exercise the ceil-half chroma planes): luma is
    // exact; chroma of every pixel equals its 2x2 block's even-grid
    // sample (nearest-neighbor upsample contract)
    val img = patternImage(5, 3)
    val c420 = Y4mCodec.encode(Seq(img), "C420")
    val back = Y4mCodec.decodeFrame(c420, 0)
    for (y <- 0 until 3; x <- 0 until 5) {
      assert(back.pixel(x, y, 0) == img.pixel(x, y, 0), s"luma $x,$y")
      assert(back.pixel(x, y, 1) == img.pixel(x / 2 * 2, y / 2 * 2, 1))
      assert(back.pixel(x, y, 2) == img.pixel(x / 2 * 2, y / 2 * 2, 2))
    }
  }

  test("Y4mCodec: golden hand-built stream, params on header and FRAME lines") {
    // 2x1 C444, 2 frames; header carries rate/interlace/aspect and an
    // X extension; the second FRAME marker carries a parameter — the
    // walker must skip both. Y plane (10,20), U (30,40), V (50,60).
    val golden =
      "YUV4MPEG2 W2 H1 F30000:1001 It A4:3 C444 XYSCSS=444\n".getBytes("US-ASCII") ++
        "FRAME\n".getBytes("US-ASCII") ++
        Array[Byte](10, 20, 30, 40, 50, 60) ++
        "FRAME Xtimecode\n".getBytes("US-ASCII") ++
        Array[Byte](11, 21, 31, 41, 51, 61)
    assert(Y4mCodec.frameCount(golden) == 2)
    val f0 = Y4mCodec.decodeFrame(golden, 0)
    assert(f0.pixels.toSeq == Seq[Byte](10, 30, 50, 20, 40, 60)) // interleaved
    val f1 = Y4mCodec.decodeFrame(golden, 1)
    assert(f1.pixels.toSeq == Seq[Byte](11, 31, 51, 21, 41, 61))
    // C420 is the spec default when no C param is present
    val noC = "YUV4MPEG2 W2 H2 F25:1\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 9, 7)
    val d = Y4mCodec.decodeFrame(noC, 0)
    assert(d.pixel(1, 1, 0) == 4 && d.pixel(1, 1, 1) == 9 &&
      d.pixel(1, 1, 2) == 7)
  }

  test("Y4mCodec: malformed streams fail loudly") {
    val ok = Y4mCodec.encode(Seq(patternImage(2, 2)), "C444")
    intercept[IllegalArgumentException](
      Y4mCodec.parseHeader("RIFFnotYUV4MPEG2".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // truncated frame payload
      Y4mCodec.frameCount(ok.dropRight(3)))
    intercept[IllegalArgumentException]( // garbage where FRAME expected
      Y4mCodec.frameCount(ok ++ "JUNK\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // frame index out of range
      Y4mCodec.decodeFrame(ok, 1))
    intercept[IllegalArgumentException]( // missing dims
      Y4mCodec.parseHeader("YUV4MPEG2 W4\nFRAME\n".getBytes("US-ASCII")))
  }

  test("frameStats: real Y4M walk, exact per-plane sums, every-k sampling") {
    val s = spark
    import s.implicits._
    def frame(f: Int) = RawImage(4, 3, 3,
      Array.tabulate(36)(i => ((i * 7 + f * 11 + 3) % 256).toByte))
    val vid = Y4mCodec.encode((0 until 5).map(frame), "C444")
    val rows = Seq(MediaRow(1L, "video", vid),
      MediaRow(2L, "image", ImageCodec.encodeBmp(patternImage(2, 2))))
    val got = frameStats(rows.toDS(), BinaryImageDecoder(), everyK = 3)
      .collect()
    assert(got.length == 1 && got(0).doc_id == 1L) // image filtered
    assert(got(0).n_frames == 5 && got(0).n_sampled == 2) // frames 0, 3
    // plane c of frame f holds pixels(p*3+c) = pattern(p*3+c), so the
    // expected per-plane sum recomputes the pattern in that order
    def interleavedPlaneSum(f: Int, c: Int): Long =
      (0 until 12).map(p => ((p * 3 + c) * 7 + f * 11 + 3) % 256).sum.toLong
    val ey = interleavedPlaneSum(0, 0) + interleavedPlaneSum(3, 0)
    val eu = interleavedPlaneSum(0, 1) + interleavedPlaneSum(3, 1)
    val ev = interleavedPlaneSum(0, 2) + interleavedPlaneSum(3, 2)
    assert((got(0).sum_y, got(0).sum_u, got(0).sum_v) == ((ey, eu, ev)))
  }

  test("imageStats: real decoder, exact channel sums over a batch") {
    val s = spark
    import s.implicits._
    val img = patternImage(4, 3)
    val rows = Seq(
      MediaRow(1L, "image", ImageCodec.encodeBmp(img)),
      MediaRow(2L, "image", ImageCodec.encodePpm(img)),
      MediaRow(3L, "audio", Array[Byte](1, 2, 3))) // filtered out
    val got = imageStats(rows.toDS(), BinaryImageDecoder())
      .collect().sortBy(_.doc_id)
    assert(got.length == 2)
    val n = 4 * 3
    val (er, eg, eb) = (
      (0 until n).map(i => ((i * 3) * 7 + 11) % 256).sum.toLong,
      (0 until n).map(i => ((i * 3 + 1) * 7 + 11) % 256).sum.toLong,
      (0 until n).map(i => ((i * 3 + 2) * 7 + 11) % 256).sum.toLong)
    got.foreach { r =>
      assert((r.width, r.height, r.channels) == ((4, 3, 3)))
      assert((r.sum_r, r.sum_g, r.sum_b) == ((er, eg, eb)), r.toString)
      assert(r.mean_luma ==
        BigDecimal((0.299 * er + 0.587 * eg + 0.114 * eb) / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
