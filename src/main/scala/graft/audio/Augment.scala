package graft.audio

/** Audio augmentation / normalization kernels for ASR training data:
  * sample-rate conversion, speed perturbation, gain, and additive
  * noise mixing — the standard augmentation set (Kaldi's
  * speed-perturb triple, SNR noise mixing) the reference delegates to
  * ffmpeg/pydub for rate normalization and that whisper-style
  * pipelines apply before feature extraction.
  *
  * All kernels are deterministic sample-level functions over [[Pcm]]
  * (16-bit mono), run per-row inside the audio `mapPartitions`
  * stages — embarrassingly parallel, no driver state, no shuffle
  * impact. Integer sample math with one IEEE division per
  * interpolated sample keeps results bit-identical across runs and
  * JVMs.
  */
object Augment {

  /** Linear-interpolation resample to `targetRate`. Output sample j
    * reads source position j·src/target split exactly into
    * (index, fraction) by LONG division — no accumulating float
    * step, so arbitrarily long clips can't drift. Identity when the
    * rates match. Output length = ⌊n·target/src⌋ (duration preserved
    * to < 1 output sample); the final interpolation clamps to the
    * last source sample.
    *
    * Linear interpolation (not windowed-sinc) is the deliberate
    * trade: it aliases above target/2 but is allocation-free and
    * ~20× cheaper — the convention ASR data loaders use
    * (torchaudio's default resampler exists for quality-critical
    * paths; training-data normalization overwhelmingly tolerates
    * linear).
    */
  def resampleLinear(p: Pcm, targetRate: Int): Pcm = {
    require(targetRate > 0, s"targetRate must be positive: $targetRate")
    if (targetRate == p.sampleRate) return p
    if (p.nSamples == 0) return Pcm(p.bytes, targetRate)
    val src = p.sampleRate.toLong
    val tgt = targetRate.toLong
    val n = p.nSamples
    val nOut = ((n.toLong * tgt) / src).toInt max 1
    val out = new Array[Int](nOut)
    var j = 0
    while (j < nOut) {
      val num = j * src // source position numerator (denominator tgt)
      val i0 = (num / tgt).toInt
      val i1 = if (i0 + 1 < n) i0 + 1 else n - 1
      val frac = (num % tgt).toDouble / tgt
      val s0 = p.sample(i0)
      val s1 = p.sample(i1)
      out(j) = math.round(s0 + (s1 - s0) * frac).toInt
      j += 1
    }
    Pcm.fromSamples(out, targetRate)
  }

  /** Speed perturbation by `factor` (Kaldi convention: 0.9 / 1.0 /
    * 1.1): the waveform plays `factor`× faster — duration divides by
    * factor, pitch shifts with it — while the nominal sample rate is
    * UNCHANGED (the point of the trick: downstream feature extraction
    * needs no special handling). Implemented as a resample to
    * rate/factor reinterpreted at the original rate.
    */
  def speedPerturb(p: Pcm, factor: Double): Pcm = {
    require(factor > 0, s"factor must be positive: $factor")
    if (factor == 1.0) return p
    val virtualRate = math.round(p.sampleRate / factor).toInt
    val r = resampleLinear(p, virtualRate)
    Pcm(r.bytes, p.sampleRate)
  }

  /** Gain by `db` decibels (amplitude × 10^(db/20)), hard-clipped to
    * the 16-bit range — clipping is reported by [[wouldClip]] so
    * callers can pre-check instead of silently distorting.
    */
  def gainDb(p: Pcm, db: Double): Pcm = {
    val g = math.pow(10.0, db / 20.0)
    Pcm.fromSamples(p.samples.map { s =>
      val v = math.round(s * g)
      if (v > 32767L) 32767 else if (v < -32768L) -32768 else v.toInt
    }, p.sampleRate)
  }

  /** True iff applying `db` gain would clip at least one sample. */
  def wouldClip(p: Pcm, db: Double): Boolean = {
    val g = math.pow(10.0, db / 20.0)
    p.samples.exists { s =>
      val v = math.round(s * g)
      v > 32767L || v < -32768L
    }
  }

  /** Additive mix: `noise` scaled by `noiseGainDb` is added
    * sample-wise onto `signal` (looping the noise if shorter, the
    * SNR-mixing convention), clipped to 16-bit. Rates must match —
    * resample the noise first.
    */
  def mixAdditive(signal: Pcm, noise: Pcm, noiseGainDb: Double = 0.0): Pcm = {
    require(signal.sampleRate == noise.sampleRate,
      s"rate mismatch: ${signal.sampleRate} vs ${noise.sampleRate} — " +
        "resampleLinear the noise first")
    if (noise.nSamples == 0) return signal
    val g = math.pow(10.0, noiseGainDb / 20.0)
    val nn = noise.nSamples
    Pcm.fromSamples(Array.tabulate(signal.nSamples) { i =>
      val v = signal.sample(i) + math.round(noise.sample(i % nn) * g)
      if (v > 32767L) 32767 else if (v < -32768L) -32768 else v.toInt
    }, signal.sampleRate)
  }
}
