package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Wave 46 (X357–X359): clipping, loudness moments, energy split —
  * the kernel laws behind q_audio_clipping/loudness/snr.
  */
class AudioQaSpec extends AnyFunSuite {

  private def pcm(s: Int*): Pcm = Pcm.fromSamples(s.toArray, 16000)

  test("clipping counts samples at full scale and the LONGEST run, " +
    "negative rail included") {
    val (n, run) = AudioQa.clipping(
      pcm(0, 32767, 32767, 32767, 5, -32767, 32767, 0, 32767))
    assert(n == 6)
    assert(run == 3)
  }

  test("clipping: clean audio reads zero; a custom full-scale " +
    "threshold applies") {
    assert(AudioQa.clipping(pcm(1, -2, 3)) == ((0L, 0L)))
    assert(AudioQa.clipping(pcm(100, 100, 99), fullScale = 100) ==
      ((2L, 2L)))
  }

  test("moments: exact n, peak, sum, sum of squares") {
    val (n, peak, sum, sumSq) = AudioQa.moments(pcm(3, -4, 0))
    assert(n == 3 && peak == 4 && sum == -1 && sumSq == 25)
  }

  test("energySplit partitions energy exactly at the threshold " +
    "(threshold value itself is quiet)") {
    val (nHi, sqHi, nLo, sqLo) =
      AudioQa.energySplit(pcm(10, -10, 11, -20, 0), 10)
    assert(nHi == 2 && sqHi == 11L * 11 + 400)
    assert(nLo == 3 && sqLo == 200)
    // conservation law: split sums equal the global moment
    val (_, _, _, total) = AudioQa.moments(pcm(10, -10, 11, -20, 0))
    assert(sqHi + sqLo == total)
  }
}
