package graft.audio

/** Audio-QA kernels over decoded PCM — the ingest gates an ASR corpus
  * runs BEFORE paying for inference (reference rejects bad clips
  * after transcription; at 100 TB the cheap signal-level gates run in
  * the scan and keep the GPU queue clean): clipping (hard-limited
  * recordings destroy alignment confidence), loudness/DC-offset
  * (miscalibrated capture chains), and a threshold SNR estimate
  * (energy ratio of loud vs quiet samples — the zero-model proxy for
  * speech-over-noise).
  *
  * Every kernel returns EXACT integer sums; dB conversions happen in
  * Column math so the DuckDB oracle replays the identical doubles.
  */
object AudioQa {

  /** (n_clipped, longest consecutive clipped run) at \|v\| ≥ fullScale. */
  def clipping(p: Pcm, fullScale: Int = 32767): (Long, Long) = {
    val s = p.samples
    var n = 0L
    var maxRun = 0L
    var run = 0L
    var i = 0
    while (i < s.length) {
      if (math.abs(s(i)) >= fullScale) {
        n += 1; run += 1
        if (run > maxRun) maxRun = run
      } else run = 0
      i += 1
    }
    (n, maxRun)
  }

  /** Exact signal moments: (n, peak \|v\|, Σv, Σv²). */
  def moments(p: Pcm): (Long, Long, Long, Long) = {
    val s = p.samples
    var peak = 0L
    var sum = 0L
    var sumSq = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      val a = math.abs(v)
      if (a > peak) peak = a
      sum += v
      sumSq += v * v
      i += 1
    }
    (s.length.toLong, peak, sum, sumSq)
  }

  /** X378 — (zero crossings, Σv² energy): the classic voiced/
    * unvoiced/noise discriminator pair — high ZCR + low energy is
    * fricative or hiss, low ZCR + high energy is voiced speech or
    * tone; together with [[moments]] they make the zero-model
    * speechiness gate. A crossing is a sign-bit flip between
    * adjacent samples with zero counted as non-negative (the
    * `v < 0` convention — exact, no epsilon).
    */
  def zcrEnergy(p: Pcm): (Long, Long) = {
    val s = p.samples
    var z = 0L
    var sq = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      sq += v * v
      if (i > 0 && ((s(i) < 0) != (s(i - 1) < 0))) z += 1
      i += 1
    }
    (z, sq)
  }

  /** Energy split at \|v\| > thresh: (n_loud, Σv²_loud, n_quiet,
    * Σv²_quiet) — the SNR numerator/denominator sums.
    */
  def energySplit(p: Pcm, thresh: Int): (Long, Long, Long, Long) = {
    val s = p.samples
    var nHi = 0L; var sqHi = 0L
    var nLo = 0L; var sqLo = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      if (math.abs(v) > thresh) { nHi += 1; sqHi += v * v }
      else { nLo += 1; sqLo += v * v }
      i += 1
    }
    (nHi, sqHi, nLo, sqLo)
  }
}
