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

/** Content-driven fake used by the E2E pipeline spec: "words" are
  * constant-amplitude sample blocks whose amplitude encodes the word
  * id (amplitude = Base + id·Step), separated by silence. The
  * recognizer scans for non-silent plateaus and decodes id → word —
  * so it genuinely re-transcribes whatever clip it is handed,
  * including assembled clips with seams and fades, with correct
  * clip-relative times.
  */
final case class AmplitudeRecognizer(
    vocab: IndexedSeq[String], confidence: Double = 0.9)
    extends WordRecognizer {
  import AmplitudeRecognizer._

  def transcribe(key: String, audio: Pcm): Seq[RecWord] = {
    val s = audio.samples
    val sr = audio.sampleRate
    val out = Seq.newBuilder[RecWord]
    var i = 0
    while (i < s.length) {
      if (math.abs(s(i)) >= Base / 2) {
        val start = i
        // plateau value = modal abs amplitude of the block (fades
        // distort edges; the plateau survives)
        var j = i
        val counts = scala.collection.mutable.Map.empty[Int, Int]
        while (j < s.length && math.abs(s(j)) >= Base / 2) {
          val v = math.abs(s(j))
          counts(v) = counts.getOrElse(v, 0) + 1
          j += 1
        }
        val plateau = counts.maxBy(c => (c._2, c._1))._1
        val id = math.round((plateau - Base).toDouble / Step).toInt
        if (id >= 0 && id < vocab.length)
          out += RecWord(vocab(id), start.toDouble / sr, j.toDouble / sr,
            confidence)
        i = j
      } else i += 1
    }
    out.result()
  }
}

object AmplitudeRecognizer {
  val Base = 2000
  val Step = 64

  /** Synthesize doc audio for a word timeline: each word is a
    * constant block at its encoded amplitude over [start, end).
    */
  def synthesize(words: Seq[(Int, Double, Double)], sr: Int): Pcm = {
    val totalS = words.map(_._3).maxOption.getOrElse(0.0) + 0.2
    val n = (totalS * sr).toInt
    val s = new Array[Int](n)
    words.foreach { case (id, st, en) =>
      val a = Base + id * Step
      var i = (st * sr).toInt
      val e = math.min(n, (en * sr).toInt)
      while (i < e) { s(i) = a; i += 1 }
    }
    Pcm.fromSamples(s, sr)
  }
}
