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
