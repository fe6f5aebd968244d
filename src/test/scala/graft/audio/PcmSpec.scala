package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the PCM kernels (D4–D6, SURVEY.md §2.7) on
  * hand-computed vectors.
  */
class PcmSpec extends AnyFunSuite {
  private val sr = 1000 // 1 sample per ms — ms == sample index

  test("roundtrip samples <-> bytes (16-bit LE, clamping)") {
    val p = Pcm.fromSamples(Array(0, 1, -1, 32767, -32768, 40000, -40000), sr)
    assert(p.samples.toSeq == Seq(0, 1, -1, 32767, -32768, 32767, -32768))
  }

  test("sliceMs: pydub half-open ms slice, clamped, inverted -> empty") {
    val p = Pcm.fromSamples(Array.tabulate(100)(identity), sr)
    assert(Pcm.sliceMs(p, 10, 13).samples.toSeq == Seq(10, 11, 12))
    assert(Pcm.sliceMs(p, 90, 200).samples.length == 10)
    assert(Pcm.sliceMs(p, -5, 2).samples.toSeq == Seq(0, 1))
    assert(Pcm.sliceMs(p, 50, 40).samples.isEmpty)
  }

  test("silence + concat preserve order and length") {
    val a = Pcm.fromSamples(Array(1, 2), sr)
    val b = Pcm.fromSamples(Array(3), sr)
    val c = Pcm.concat(Seq(a, Pcm.silence(2, sr), b), sr)
    assert(c.samples.toSeq == Seq(1, 2, 0, 0, 3))
  }

  test("fadeIn: linear ramp 0->1 over k samples") {
    val p = Pcm.fromSamples(Array.fill(8)(1000), sr)
    val f = Pcm.fadeIn(p, 4)
    assert(f.samples.toSeq == Seq(0, 250, 500, 750, 1000, 1000, 1000, 1000))
  }

  test("fadeOut: linear ramp 1->0 over last k samples") {
    val p = Pcm.fromSamples(Array.fill(8)(1000), sr)
    val f = Pcm.fadeOut(p, 4)
    assert(f.samples.toSeq == Seq(1000, 1000, 1000, 1000, 750, 500, 250, 0))
  }

  test("rms and dBFS: full-scale square wave = 0 dBFS, silence = -inf") {
    val full = Pcm.fromSamples(Array.fill(100)(32768 - 1), sr)
    assert(math.abs(Pcm.dbfs(full)) < 0.001)
    val half = Pcm.fromSamples(Array.fill(100)(16384), sr)
    assert(math.abs(Pcm.dbfs(half) - 20 * math.log10(0.5)) < 0.001)
    assert(Pcm.dbfs(Pcm.silence(10, sr)).isNegInfinity)
  }

  test("lengthMs truncates like pydub len()") {
    assert(Pcm.fromSamples(Array.fill(44)(0), 16000).lengthMs == 2)
  }
}
