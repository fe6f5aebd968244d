package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Decision-parity tests for the librosa-free DSP kernels (D1–D3):
  * fixed-vector golden values for the primitives, accept/reject
  * behavior for the composite (SURVEY.md §7.4 hard part 2).
  */
class DspSpec extends AnyFunSuite {
  private val sr = 16000

  test("magnitudeSpectrum: pure cosine concentrates in its bin") {
    val n = 256
    val k0 = 8
    val frame = Array.tabulate(n)(t => math.cos(2 * math.Pi * k0 * t / n))
    val mag = Dsp.magnitudeSpectrum(frame)
    assert(math.abs(mag(k0) - n / 2.0) < 1e-6)
    (0 until n / 2 + 1).filter(_ != k0).foreach(k => assert(mag(k) < 1e-6))
  }

  test("dct2: matches scipy dct(type=2, norm='ortho') golden values") {
    // scipy.fft.dct([1,2,3,4], type=2, norm='ortho')
    val got = Dsp.dct2(Array(1.0, 2.0, 3.0, 4.0), 4)
    val want = Array(5.0, -2.2304424973875625, 0.0, -0.15851266778127635)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("melFilterbank: rows are triangular, non-negative, bounded") {
    val fb = Dsp.melFilterbank(26, 512, sr)
    assert(fb.length == 26)
    fb.foreach { row =>
      assert(row.forall(v => v >= 0.0 && v <= 1.0))
      assert(row.exists(_ > 0.0))
    }
  }

  test("mfccBoundaryDistance: signal->silence boundary is large, " +
      "uniform audio is small, short windows are 0") {
    val tone = Array.tabulate(sr)(t =>
      (8000 * math.sin(2 * math.Pi * 440 * t / sr)).toInt)
    val silence = Array.fill(sr)(0)
    val disc = Pcm.fromSamples(tone ++ silence, sr)
    val flat = Pcm.fromSamples(tone ++ tone, sr)
    val dDisc = Dsp.mfccBoundaryDistance(disc, 1000)
    val dFlat = Dsp.mfccBoundaryDistance(flat, 1000)
    assert(dDisc > Dsp.MfccThreshold, s"discontinuity $dDisc")
    assert(dFlat < dDisc / 4, s"flat $dFlat vs $dDisc")
    assert(Dsp.mfccBoundaryDistance(disc, 1) == 0.0) // <100-sample guard
  }

  test("spectralFlux: abrupt transition >> steady tone; short window 0") {
    val tone = Array.tabulate(sr)(t =>
      (12000 * math.sin(2 * math.Pi * 440 * t / sr)).toInt)
    val loudNoise = Array.tabulate(sr) { t =>
      // deterministic pseudo-noise
      val x = math.sin(t * 12.9898) * 43758.5453
      (20000 * (x - math.floor(x) - 0.5)).toInt
    }
    val trans = Pcm.fromSamples(tone ++ loudNoise, sr)
    val steady = Pcm.fromSamples(tone ++ tone, sr)
    val fTrans = Dsp.spectralFlux(trans, 1000)
    val fSteady = Dsp.spectralFlux(steady, 1000)
    assert(fTrans > fSteady)
    assert(Dsp.spectralFlux(trans, 0) == 0.0)
  }

  test("checkBoundaryLeakage: boundary inside silence -> clean; loud " +
      "discontinuous audio after boundary -> leakage (2-of-3)") {
    val tone = Array.tabulate(sr / 2)(t =>
      (8000 * math.sin(2 * math.Pi * 440 * t / sr)).toInt)
    val tail = Array.fill(sr / 2)(0)
    val clean = Pcm.fromSamples(tone ++ tail, sr)
    // boundary 200ms into the silent tail: all three votes negative.
    // (At the exact tone→silence edge, MFCC+flux genuinely vote
    // "discontinuity" — 2-of-3 flags it, faithfully to the reference.)
    val (leak1, d1) = Dsp.checkBoundaryLeakage(clean, 700)
    assert(!leak1)
    assert(d1.exists(!_.energyLeak))
    val (leakEdge, _) = Dsp.checkBoundaryLeakage(clean, 500)
    assert(leakEdge)

    val loudTail = Array.tabulate(sr / 2) { t =>
      val x = math.sin(t * 78.233) * 12543.123
      (24000 * (x - math.floor(x) - 0.5)).toInt
    }
    val leaky = Pcm.fromSamples(tone ++ loudTail, sr)
    val (leak2, d2) = Dsp.checkBoundaryLeakage(leaky, 500)
    assert(leak2, s"details: $d2")

    // past-the-end boundary: empty window -> no leak, no details
    assert(Dsp.checkBoundaryLeakage(clean, 2000)._1 == false && Dsp.checkBoundaryLeakage(clean, 2000)._2.isEmpty)
  }
}
