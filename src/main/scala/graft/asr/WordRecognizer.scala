package graft.asr

import graft.audio.Pcm

/** One recognized word as produced by an ASR backend, before
  * normalization (reference: WhisperX word dicts,
  * claude_research_optimal.py:254–277; validator words :353–363).
  * Times are seconds relative to the transcribed audio.
  */
final case class RecWord(
    text: String, start: Double, end: Double, confidence: Double)

/** S3/S4 — the pluggable inference boundary (SURVEY.md §2.1). The
  * reference crosses into WhisperX/faster-whisper on GPU; the engine
  * treats recognition as an injected function applied inside
  * `mapPartitions`, one model handle per partition, so executors
  * batch GPU work and no temp files are involved (the reference's
  * per-clip wav handoff, claude_research_optimal.py:346–349, is
  * eliminated — PCM stays in memory).
  *
  * Real backends are out of scope in this offline environment; tests
  * and the E2E spec use deterministic fakes (`AmplitudeRecognizer`).
  */
trait WordRecognizer extends Serializable {
  /** `key` identifies the unit being transcribed (doc or clip) so
    * fixture-driven fakes can respond deterministically.
    */
  def transcribe(key: String, audio: Pcm): Seq[RecWord]
}

/** Fixture recognizer: a fixed key → words table. */
final case class FixtureRecognizer(byKey: Map[String, Seq[RecWord]])
    extends WordRecognizer {
  def transcribe(key: String, audio: Pcm): Seq[RecWord] =
    byKey.getOrElse(key, Seq.empty)
}

/** Content-driven fake used by the E2E pipeline and contract query:
  * a word is a sequence of constant-amplitude character blocks —
  * block p of a word carries character code c as amplitude
  * Base + c·Step with sign (−1)^p, so equal adjacent characters stay
  * separable (the sign flips) and silence (|v| < Base/2) delimits
  * words. The recognizer segments non-silent spans into same-sign
  * runs, reads each run's modal |amplitude| (fades distort edges;
  * the plateau majority survives) and rebuilds the word text — so it
  * genuinely re-transcribes whatever clip it is handed, including
  * assembled clips with seams and fades, with correct clip-relative
  * times, and needs NO vocabulary table: the audio itself carries
  * the words, exactly like real speech. (The round-1 design encoded
  * a global vocab index, which forced a driver-side vocabulary
  * collect in the contract query.)
  */
final case class AmplitudeRecognizer(confidence: Double = 0.9)
    extends WordRecognizer {
  import AmplitudeRecognizer._

  def transcribe(key: String, audio: Pcm): Seq[RecWord] = {
    val s = audio.samples
    val sr = audio.sampleRate
    val out = Seq.newBuilder[RecWord]
    // per-code plateau votes, reused across runs (fade-distorted
    // samples land between grid points and round to a neighbor code,
    // but the undistorted plateau majority always wins)
    val votes = new Array[Int](MaxCode)
    var i = 0
    while (i < s.length) {
      if (math.abs(s(i)) >= Base / 2) {
        val start = i
        val chars = new StringBuilder
        var j = i
        while (j < s.length && math.abs(s(j)) >= Base / 2) {
          // one same-sign run = one character block
          val sign = s(j) > 0
          var bestCode = -1
          var bestVotes = 0
          while (j < s.length && math.abs(s(j)) >= Base / 2 &&
              (s(j) > 0) == sign) {
            val code = (math.abs(s(j)) - Base + Step / 2) / Step
            if (code >= 0 && code < MaxCode) {
              val v = votes(code) + 1
              votes(code) = v
              // ties → higher code, matching exact-plateau preference
              if (v > bestVotes || (v == bestVotes && code > bestCode)) {
                bestVotes = v; bestCode = code
              }
            }
            j += 1
          }
          java.util.Arrays.fill(votes, 0) // reset (small, vectorized)
          if (bestCode >= 0) chars += bestCode.toChar
        }
        if (chars.nonEmpty)
          out += RecWord(chars.result(), start.toDouble / sr,
            j.toDouble / sr, confidence)
        i = j
      } else i += 1
    }
    out.result()
  }
}

object AmplitudeRecognizer {
  val Base = 2000
  val Step = 64
  /** Codes ≥ MaxCode would exceed 16-bit amplitude; synthesize clamps
    * (exotic characters alias deterministically on both sides).
    */
  val MaxCode: Int = (Short.MaxValue - Base) / Step

  /** Synthesize doc audio for a word timeline: each word's span
    * [start, end) is split into `word.length` equal character blocks,
    * block p at amplitude Base + code·Step, sign (−1)^p.
    */
  def synthesize(words: Seq[(String, Double, Double)], sr: Int): Pcm = {
    val totalS = words.map(_._3).maxOption.getOrElse(0.0) + 0.2
    val n = (totalS * sr).toInt
    val s = new Array[Int](n)
    words.foreach { case (w, st, en) =>
      if (w.nonEmpty) {
        val i0 = (st * sr).toInt
        val i1 = math.min(n, (en * sr).toInt)
        val len = i1 - i0
        var p = 0
        while (p < w.length) {
          val code = math.min(w.charAt(p).toInt, MaxCode - 1)
          val a = (Base + code * Step) * (if (p % 2 == 0) 1 else -1)
          var i = i0 + p * len / w.length
          val e = i0 + (p + 1) * len / w.length
          while (i < e) { s(i) = a; i += 1 }
          p += 1
        }
      }
    }
    Pcm.fromSamples(s, sr)
  }
}
