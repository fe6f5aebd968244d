package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Augment kernel semantics: exact alignment cases for the linear
  * resampler, frequency preservation on a sine, speed-perturb
  * duration math, gain/clip behavior, and noise-loop mixing.
  */
class AugmentSpec extends AnyFunSuite {

  private def sine(hz: Double, sr: Int, n: Int, amp: Int = 10000): Pcm =
    Pcm.fromSamples(Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * hz * i / sr)).toInt), sr)

  private def zeroCrossings(p: Pcm): Int =
    (1 until p.nSamples).count(i =>
      (p.sample(i - 1) < 0) != (p.sample(i) < 0))

  test("resampleLinear: identity at equal rate") {
    val p = sine(440, 16000, 1600)
    assert(Augment.resampleLinear(p, 16000) eq p)
  }

  test("resampleLinear: exact 2x upsample interleaves midpoints") {
    val p = Pcm.fromSamples(Array(0, 100, -50, 200), 8000)
    val r = Augment.resampleLinear(p, 16000)
    assert(r.sampleRate == 16000 && r.nSamples == 8)
    // even output indices are the source samples exactly (frac = 0)
    assert((0 until 4).forall(i => r.sample(2 * i) == p.sample(i)))
    // odd indices are midpoints
    assert(r.sample(1) == 50 && r.sample(3) == 25 && r.sample(5) == 75)
  }

  test("resampleLinear: exact 2x downsample keeps every other sample") {
    val p = Pcm.fromSamples(Array.tabulate(100)(i => i * 7 - 300), 16000)
    val r = Augment.resampleLinear(p, 8000)
    assert(r.nSamples == 50)
    assert((0 until 50).forall(i => r.sample(i) == p.sample(2 * i)))
  }

  test("resampleLinear: duration and tone survive 16k->44.1k->16k") {
    val sr = 16000
    val p = sine(440, sr, sr) // 1 second of A4
    val up = Augment.resampleLinear(p, 44100)
    assert(math.abs(up.nSamples - 44100) <= 1)
    val back = Augment.resampleLinear(up, sr)
    assert(math.abs(back.nSamples - sr) <= 2)
    // 440 Hz = 880 zero crossings/s; irrational-ratio resample keeps
    // the tone (linear interp error flips no crossing at this amp)
    assert(math.abs(zeroCrossings(back) - zeroCrossings(p)) <= 2)
  }

  test("resampleLinear: no drift on long clips (exact rational step)") {
    // 10 s at 44.1k -> 16k: last output sample must map inside the
    // source (a float-accumulating step would walk past the end)
    val p = sine(100, 44100, 441000)
    val r = Augment.resampleLinear(p, 16000)
    assert(r.nSamples == 160000)
    assert(math.abs(zeroCrossings(r) - zeroCrossings(p)) <= 2)
  }

  test("speedPerturb: 1.1x shortens duration, keeps nominal rate") {
    val p = sine(440, 16000, 16000)
    val f = Augment.speedPerturb(p, 1.1)
    assert(f.sampleRate == 16000)
    // duration / 1.1, within rounding of the virtual-rate trick
    assert(math.abs(f.nSamples - 16000 / 1.1) < 20)
    // pitch shifts up with the speedup: crossings preserved in count
    // per CLIP (same cycles squeezed into less time)
    assert(math.abs(zeroCrossings(f) - zeroCrossings(p)) <= 4)
    assert(Augment.speedPerturb(p, 1.0) eq p)
  }

  test("gainDb: +6.0206 dB doubles amplitude; clip reported") {
    val p = Pcm.fromSamples(Array(1000, -2000, 0, 30), 16000)
    val g = Augment.gainDb(p, 20.0 * math.log10(2.0))
    assert(g.samples.toSeq == Seq(2000, -4000, 0, 60))
    assert(!Augment.wouldClip(p, 6.0))
    val loud = Pcm.fromSamples(Array(30000), 16000)
    assert(Augment.wouldClip(loud, 6.0))
    assert(Augment.gainDb(loud, 6.0).sample(0) == 32767) // hard clip
    assert(Augment.gainDb(Pcm.fromSamples(Array(-30000), 16000), 6.0)
      .sample(0) == -32768)
  }

  test("mixAdditive: loops short noise, clips, rejects rate mismatch") {
    val signal = Pcm.fromSamples(Array(100, 200, 300, 400, 500), 16000)
    val noise = Pcm.fromSamples(Array(10, -10), 16000)
    val m = Augment.mixAdditive(signal, noise)
    assert(m.samples.toSeq == Seq(110, 190, 310, 390, 510))
    // -6.0206 dB halves the noise
    val half = Augment.mixAdditive(signal, noise, -20.0 * math.log10(2.0))
    assert(half.samples.toSeq == Seq(105, 195, 305, 395, 505))
    val hot = Pcm.fromSamples(Array(32000), 16000)
    assert(Augment.mixAdditive(hot, Pcm.fromSamples(Array(32000), 16000))
      .sample(0) == 32767)
    intercept[IllegalArgumentException] {
      Augment.mixAdditive(signal, Pcm.fromSamples(Array(1), 8000))
    }
  }

  test("resampleLinear: empty input stays empty at the new rate") {
    val e = Pcm.fromSamples(Array.empty[Int], 44100)
    val r = Augment.resampleLinear(e, 16000)
    assert(r.nSamples == 0 && r.sampleRate == 16000)
  }
}
