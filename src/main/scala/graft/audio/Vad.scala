package graft.audio

/** Energy-threshold voice-activity detection: frame-level RMS gate +
  * island merge + minimum duration — the segmentation primitive
  * behind "split long audio at silence boundaries" (the upstream
  * normalization step SCALING.md's ASR section assumes, and the
  * seam the reference's silence handling sits on). Deterministic
  * integer/double arithmetic end to end, so a SQL oracle can replay
  * the decisions exactly (see q_vad_segments).
  *
  * Runs per audio row inside the same mapPartitions stages as the
  * other audio kernels — no shuffle, frames never materialize as
  * rows.
  */
object Vad {

  /** Voice segments of `samples` as [startFrame, endFrame) pairs:
    * a frame (length `frame`, trailing partial frame ignored) is
    * active iff its RMS ≥ `rmsThreshold`; runs of active frames
    * merge; runs shorter than `minFrames` drop.
    */
  def segments(samples: Array[Int], frame: Int, rmsThreshold: Double,
      minFrames: Int): Seq[(Int, Int)] = {
    require(frame > 0 && minFrames >= 1,
      s"frame=$frame, minFrames=$minFrames must be positive")
    val nFrames = samples.length / frame
    val out = Seq.newBuilder[(Int, Int)]
    var start = -1
    var j = 0
    while (j < nFrames) {
      var ss = 0L
      var i = j * frame
      val end = i + frame
      while (i < end) {
        ss += samples(i).toLong * samples(i); i += 1
      }
      val active = math.sqrt(ss.toDouble / frame) >= rmsThreshold
      if (active && start < 0) start = j
      else if (!active && start >= 0) {
        if (j - start >= minFrames) out += ((start, j))
        start = -1
      }
      j += 1
    }
    if (start >= 0 && nFrames - start >= minFrames)
      out += ((start, nFrames))
    out.result()
  }
}
