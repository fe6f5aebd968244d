package graft.audio

/** D1–D3 — acoustic-validation kernels (claude_research_optimal.py:
  * 113–232), librosa-free. The reference itself treats these as
  * best-effort (any error → "no leak"); parity target is
  * same accept/reject decisions on fixtures, not bit-equality with
  * librosa (SURVEY.md §7.4). All pure functions — safe inside
  * executor-side kernels and UDFs.
  */
object Dsp {

  /** Naive DFT magnitude spectrum of a real frame (first n/2+1 bins).
    * O(n²) on ≤1k-sample windows — bounded, no FFT dependency.
    */
  def magnitudeSpectrum(frame: Array[Double]): Array[Double] = {
    val n = frame.length
    val bins = n / 2 + 1
    val out = new Array[Double](bins)
    var k = 0
    while (k < bins) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += frame(t) * math.cos(ang)
        im += frame(t) * math.sin(ang)
        t += 1
      }
      out(k) = math.sqrt(re * re + im * im)
      k += 1
    }
    out
  }

  private def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / n))

  private def hzToMel(hz: Double): Double =
    2595.0 * math.log10(1.0 + hz / 700.0)
  private def melToHz(mel: Double): Double =
    700.0 * (math.pow(10.0, mel / 2595.0) - 1.0)

  /** Triangular mel filterbank (nMels filters over nFft/2+1 bins). */
  def melFilterbank(nMels: Int, nFft: Int, sr: Int): Array[Array[Double]] = {
    val bins = nFft / 2 + 1
    val maxMel = hzToMel(sr / 2.0)
    val centers = Array.tabulate(nMels + 2)(i => melToHz(maxMel * i / (nMels + 1)))
    val centerBins = centers.map(hz => hz * nFft / sr)
    Array.tabulate(nMels) { m =>
      val (lo, c, hi) = (centerBins(m), centerBins(m + 1), centerBins(m + 2))
      Array.tabulate(bins) { b =>
        if (b <= lo || b >= hi) 0.0
        else if (b <= c) (b - lo) / (c - lo)
        else (hi - b) / (hi - c)
      }
    }
  }

  /** DCT-II with orthonormal scaling (librosa/scipy `norm='ortho'`). */
  def dct2(x: Array[Double], nOut: Int): Array[Double] = {
    val n = x.length
    Array.tabulate(nOut) { k =>
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x(i) * math.cos(math.Pi * k * (2 * i + 1) / (2.0 * n))
        i += 1
      }
      val scale =
        if (k == 0) math.sqrt(1.0 / (4.0 * n)) else math.sqrt(1.0 / (2.0 * n))
      2.0 * acc * scale
    }
  }

  val MfccCoeffs = 13
  private val MfccFrame = 512
  private val MfccHop = 256
  private val MfccMels = 26

  /** 13-coefficient MFCC matrix (frames × coeffs) of a sample window:
    * hann-windowed 512/256 framing, 26-filter mel filterbank on the
    * power spectrum, log, DCT-II ortho.
    */
  def mfcc(samples: Array[Double], sr: Int): Array[Array[Double]] = {
    if (samples.length < MfccFrame) return Array.empty
    val win = hann(MfccFrame)
    val fb = melFilterbank(MfccMels, MfccFrame, sr)
    val nFrames = (samples.length - MfccFrame) / MfccHop + 1
    Array.tabulate(nFrames) { f =>
      val frame = Array.tabulate(MfccFrame)(i => samples(f * MfccHop + i) * win(i))
      val mag = magnitudeSpectrum(frame)
      val power = mag.map(m => m * m)
      val melE = fb.map(filt => {
        var acc = 0.0
        var b = 0
        while (b < filt.length) { acc += filt(b) * power(b); b += 1 }
        math.log(math.max(acc, 1e-10))
      })
      dct2(melE, MfccCoeffs)
    }
  }

  /** D1 — MFCC boundary distance (claude_research_optimal.py:113–157):
    * L2 distance between mean MFCC vectors of the `windowMs` windows
    * before and after `boundaryMs`; 0.0 when either window is shorter
    * than 100 samples (reference guard).
    */
  def mfccBoundaryDistance(p: Pcm, boundaryMs: Long, windowMs: Int = 50): Double = {
    val sr = p.sampleRate
    val all = p.samples.map(_.toDouble)
    val b = (boundaryMs * sr / 1000).toInt
    val w = windowMs * sr / 1000
    val before = all.slice(math.max(0, b - w), math.min(b, all.length))
    val after = all.slice(math.max(0, b), math.min(all.length, b + w))
    if (before.length < 100 || after.length < 100) return 0.0
    val mb = meanVec(mfcc(before, sr))
    val ma = meanVec(mfcc(after, sr))
    if (mb.isEmpty || ma.isEmpty) return 0.0
    math.sqrt(mb.zip(ma).map { case (x, y) => (x - y) * (x - y) }.sum)
  }

  private def meanVec(m: Array[Array[Double]]): Array[Double] =
    if (m.isEmpty) Array.empty
    else Array.tabulate(m(0).length)(j => m.map(_(j)).sum / m.length)

  private val FluxFrame = 256
  private val FluxHop = 64

  /** D2 — spectral flux (claude_research_optimal.py:159–187): STFT
    * over the ±windowMs/2 window around the boundary,
    * Σ diff(|STFT|)² / 1e9; 0.0 when the window is shorter than 512
    * samples (reference guard).
    */
  def spectralFlux(p: Pcm, boundaryMs: Long, windowMs: Int = 50): Double = {
    val sr = p.sampleRate
    val all = p.samples.map(_.toDouble)
    val b = (boundaryMs * sr / 1000).toInt
    val half = windowMs * sr / 1000 / 2
    val win = all.slice(math.max(0, b - half), math.min(all.length, b + half))
    if (win.length < 512) return 0.0
    val nFrames = (win.length - FluxFrame) / FluxHop + 1
    if (nFrames < 2) return 0.0
    val specs = Array.tabulate(nFrames)(f =>
      magnitudeSpectrum(win.slice(f * FluxHop, f * FluxHop + FluxFrame)))
    var acc = 0.0
    var f = 1
    while (f < nFrames) {
      var k = 0
      while (k < specs(f).length) {
        val d = specs(f)(k) - specs(f - 1)(k)
        acc += d * d
        k += 1
      }
      f += 1
    }
    acc / 1e9
  }

  /** D3 — boundary-leakage verdict (claude_research_optimal.py:
    * 189–232): dBFS energy + MFCC discontinuity + spectral flux,
    * 2-of-3 vote. Empty after-window → no leak ("no_audio").
    */
  final case class LeakDetails(
      energyDb: Double, mfccDistance: Double, spectralFlux: Double,
      energyLeak: Boolean, mfccLeak: Boolean, fluxLeak: Boolean)

  val MfccThreshold = 15.0
  val FluxThreshold = 0.5

  def checkBoundaryLeakage(p: Pcm, boundaryMs: Long,
      silenceThresholdDb: Double = -40.0): (Boolean, Option[LeakDetails]) = {
    val windowMs = 50
    val after = Pcm.sliceMs(p, boundaryMs, boundaryMs + windowMs)
    if (after.lengthMs == 0) return (false, None)
    val db = Pcm.dbfs(after)
    val hasEnergy = db > silenceThresholdDb
    val dist = mfccBoundaryDistance(p, boundaryMs, windowMs)
    val hasDisc = dist > MfccThreshold
    val flux = spectralFlux(p, boundaryMs, windowMs)
    val hasTrans = flux > FluxThreshold
    val votes = Seq(hasEnergy, hasDisc, hasTrans).count(identity)
    (votes >= 2,
      Some(LeakDetails(db, dist, flux, hasEnergy, hasDisc, hasTrans)))
  }
}
