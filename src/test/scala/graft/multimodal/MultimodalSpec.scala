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
}
