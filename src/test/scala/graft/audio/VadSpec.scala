package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Vad.segments: island boundaries, min-duration drop, threshold
  * equality, tail frames, and partial-frame truncation.
  */
class VadSpec extends AnyFunSuite {

  /** nFrames frames of 4 samples each at constant amplitude amp(j). */
  private def signal(amps: Seq[Int]): Array[Int] =
    amps.flatMap(a => Seq(a, -a, a, -a)).toArray

  test("silence-speech-silence yields one segment; short blips drop") {
    // frames: 0 0 5 5 5 0 4 0 0 — the lone frame-6 blip is < minFrames
    val s = signal(Seq(0, 0, 5, 5, 5, 0, 4, 0, 0))
    assert(Vad.segments(s, 4, 3.0, 2) == Seq((2, 5)))
    // minFrames=1 keeps the blip
    assert(Vad.segments(s, 4, 3.0, 1) == Seq((2, 5), (6, 7)))
  }

  test("threshold is >= (an exactly-threshold frame is active)") {
    val s = signal(Seq(3, 3, 2, 2))
    assert(Vad.segments(s, 4, 3.0, 2) == Seq((0, 2)))
  }

  test("active run reaching the end emits; partial tail frame ignored") {
    val s = signal(Seq(0, 6, 6)) ++ Array(9, 9) // 2-sample partial tail
    assert(Vad.segments(s, 4, 3.0, 2) == Seq((1, 3)))
  }

  test("all-silence and empty inputs yield no segments") {
    assert(Vad.segments(signal(Seq(0, 0, 0)), 4, 3.0, 2).isEmpty)
    assert(Vad.segments(Array.empty[Int], 4, 3.0, 2).isEmpty)
  }
}
