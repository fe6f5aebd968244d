package graft.audio

/** 16-bit signed little-endian mono PCM with pydub-compatible
  * millisecond slicing semantics — the engine's audio value type
  * (reference: pydub AudioSegment, claude_research_optimal.py:474,
  * 308–341). Kept as raw bytes so it travels as a Spark
  * `BinaryType` column; all kernels are pure functions usable both
  * in `Dataset` kernels and (wrapped) as UDFs.
  */
final case class Pcm(bytes: Array[Byte], sampleRate: Int) {
  def nSamples: Int = bytes.length / 2
  /** pydub len(seg): duration in whole milliseconds. */
  def lengthMs: Long = nSamples * 1000L / sampleRate
  def durationSeconds: Double = nSamples.toDouble / sampleRate

  def sample(i: Int): Int = {
    val lo = bytes(2 * i) & 0xFF
    val hi = bytes(2 * i + 1)
    (hi << 8) | lo
  }
  def samples: Array[Int] = Array.tabulate(nSamples)(sample)
}

object Pcm {

  def fromSamples(s: Array[Int], sampleRate: Int): Pcm = {
    val out = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) {
      val v = math.max(-32768, math.min(32767, s(i)))
      out(2 * i) = (v & 0xFF).toByte
      out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    Pcm(out, sampleRate)
  }

  private def msToSample(ms: Long, sr: Int): Int = (ms * sr / 1000).toInt

  /** D5 — AudioSegment.silent(duration_ms). */
  def silence(ms: Long, sampleRate: Int): Pcm =
    Pcm(new Array[Byte](msToSample(math.max(0, ms), sampleRate) * 2), sampleRate)

  /** D6 — pydub `audio[s_ms:e_ms]`: millisecond slice, clamped,
    * empty when the range is inverted.
    */
  def sliceMs(p: Pcm, sMs: Long, eMs: Long): Pcm = {
    val n = p.nSamples
    val s = math.max(0, math.min(n, msToSample(math.max(0, sMs), p.sampleRate)))
    val e = math.max(s, math.min(n, msToSample(math.max(0, eMs), p.sampleRate)))
    Pcm(java.util.Arrays.copyOfRange(p.bytes, 2 * s, 2 * e), p.sampleRate)
  }

  /** A7/K3 — ordered concatenation (pydub `+`). */
  def concat(parts: Seq[Pcm], sampleRate: Int): Pcm = {
    val total = parts.map(_.bytes.length).sum
    val out = new Array[Byte](total)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p.bytes, 0, out, off, p.bytes.length)
      off += p.bytes.length
    }
    Pcm(out, sampleRate)
  }

  /** D4 — linear amplitude ramp 0→1 over the first `ms` milliseconds
    * (fade_in). The reference's pydub fades are gain ramps; the
    * kernel is pluggable and golden-tested on fixed vectors
    * (SURVEY.md §7.4 hard part 2 — decision-parity, not
    * bit-parity with pydub's chunked dB interpolation).
    */
  def fadeIn(p: Pcm, ms: Long): Pcm = {
    val n = p.nSamples
    val k = math.min(n, msToSample(math.max(0, ms), p.sampleRate))
    if (k == 0) return p
    val s = p.samples
    var i = 0
    while (i < k) { s(i) = (s(i).toDouble * i / k).toInt; i += 1 }
    fromSamples(s, p.sampleRate)
  }

  /** D4 — linear amplitude ramp 1→0 over the last `ms` milliseconds. */
  def fadeOut(p: Pcm, ms: Long): Pcm = {
    val n = p.nSamples
    val k = math.min(n, msToSample(math.max(0, ms), p.sampleRate))
    if (k == 0) return p
    val s = p.samples
    var i = 0
    while (i < k) {
      s(n - 1 - i) = (s(n - 1 - i).toDouble * i / k).toInt
      i += 1
    }
    fromSamples(s, p.sampleRate)
  }

  /** pydub AudioSegment.rms — root-mean-square of samples. */
  def rms(p: Pcm): Double = {
    val n = p.nSamples
    if (n == 0) return 0.0
    var acc = 0.0
    var i = 0
    while (i < n) { val v = p.sample(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc / n)
  }

  /** pydub AudioSegment.dBFS: 20·log10(rms / 32768); -inf on silence. */
  def dbfs(p: Pcm): Double = {
    val r = rms(p)
    if (r == 0.0) Double.NegativeInfinity
    else 20.0 * math.log10(r / 32768.0)
  }
}
