package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.Dedup
import Multimodal.RawImage

/** r9 wave 7: X157 perceptual hash + banded Hamming near-dup join,
  * X158 profile drift.
  */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def gradient(w: Int, h: Int, f: (Int, Int) => Int): RawImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = (f(x, y) & 0xFF).toByte
    RawImage(w, h, 3, px)
  }

  test("phash is deterministic, survives resolution change, and " +
    "separates different content") {
    def pattern(x: Int, y: Int): Int = (x * 5 + y * 3) % 197
    val a64 = gradient(64, 64, (x, y) => pattern(x / 2, y / 2))
    val a32 = gradient(32, 32, pattern)
    val inv = gradient(32, 32, (x, y) => 255 - pattern(x, y))
    val h1 = Multimodal.phash(a32)
    assert(h1 == Multimodal.phash(a32)) // deterministic
    // same content at 2x resolution -> within a few bits
    val dRes = java.lang.Long.bitCount(h1 ^ Multimodal.phash(a64))
    assert(dRes <= 8, s"resolution change moved $dRes bits")
    // inverted content -> far away
    val dInv = java.lang.Long.bitCount(h1 ^ Multimodal.phash(inv))
    assert(dInv >= 20, s"inversion only moved $dInv bits")
    // single-pixel perturbation -> within a few bits
    val tweaked = gradient(32, 32,
      (x, y) => if (x == 0 && y == 0) pattern(x, y) + 9 else pattern(x, y))
    val dTweak = java.lang.Long.bitCount(h1 ^ Multimodal.phash(tweaked))
    assert(dTweak <= 6, s"one-pixel tweak moved $dTweak bits")
  }

  test("phash handles single-channel images (luma = the channel)") {
    val g = RawImage(4, 4, 1,
      Array.tabulate(16)(i => (i * 16).toByte))
    val h = Multimodal.phash(g)
    assert(h == Multimodal.phash(g))
  }

  test("hammingPairs finds EVERY pair within maxDist (pigeonhole " +
    "recall) and reports exact distances") {
    val s = spark
    import s.implicits._
    val base = 0x1234_5678_9ABC_DEF0L
    // perturbations spread across bands: any <=3 flipped bits leave
    // one of the 4 16-bit bands intact
    val flips = Seq(
      Seq(0), Seq(63), Seq(0, 21), Seq(5, 60), Seq(0, 21, 42),
      Seq(15, 16, 17), Seq(1, 31, 62))
    val rows = (0L, base) +: flips.zipWithIndex.map { case (bs, i) =>
      ((i + 1).toLong, bs.foldLeft(base)((h, b) => h ^ (1L << b)))
    }
    val out = Dedup.hammingPairs(rows.toDF("id", "h"), "id", "h",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // every perturbed id pairs with the base at its exact distance
    flips.zipWithIndex.foreach { case (bs, i) =>
      assert(out.get((0L, (i + 1).toLong)).contains(bs.length.toLong),
        s"missing/wrong pair for flips $bs")
    }
    // a 4-bit spread (one per band) must NOT appear at maxDist=3
    val far = Seq((0L, base), (99L, base ^ 0x0001_0001_0001_0001L))
    assert(Dedup.hammingPairs(far.toDF("id", "h"), "id", "h", 3)
      .count() == 0)
    // ... but widening maxDist to 4 (5 bands) finds it at dist 4
    val found = Dedup.hammingPairs(far.toDF("id", "h"), "id", "h", 4)
      .collect()
    assert(found.length == 1 && found.head.getLong(2) == 4L)
  }

  test("profileDrift reports null rates, distincts, and changed " +
    "bounds") {
    val s = spark
    import s.implicits._
    val base = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "a"),
      (Some(2L), "c")).toDF("v", "s")
    val cur = Seq((Some(5L), "a"), (Some(1L), "a")).toDF("v", "s")
    val out = graft.operators.CorpusOps.profileDrift(base, cur,
        Seq("v", "s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val v = out("v")
    assert(v.getAs[Long]("nonnull_base") == 3L)
    assert(v.getAs[Long]("nonnull_cur") == 2L)
    assert(v.getAs[Long]("distinct_base") == 2L)
    assert(v.getAs[Long]("distinct_cur") == 2L)
    assert(v.getAs[Double]("null_rate_base") == 0.25)
    assert(v.getAs[Double]("null_rate_cur") == 0.0)
    assert(!v.getAs[Boolean]("min_changed")) // min 1 on both sides
    assert(v.getAs[Boolean]("max_changed"))  // 2 -> 5
    val t = out("s")
    assert(t.getAs[Double]("null_rate_base") == 0.0)
    assert(!t.getAs[Boolean]("min_changed")) // "a" both
    assert(t.getAs[Boolean]("max_changed"))  // "c" -> "a"
  }
}
