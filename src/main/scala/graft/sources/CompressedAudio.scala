package graft.sources

import java.io.ByteArrayOutputStream

import graft.audio.Pcm

/** Pluggable decoder boundary for compressed audio (mp3/m4a/mp4…).
  * The reference accepts these via pydub→ffmpeg
  * (`/root/reference/gui.py:97-99`,
  * `claude_research_optimal.py:474`); the engine's WAV decoder
  * rejects them with a per-file reason, and this trait is the gate a
  * production deployment opens: plug a decoder and the rejection
  * branch becomes a decode branch. Implementations must be
  * Serializable — one instance ships in the scan-task closure and
  * decodes file-at-a-time on executors, exactly where the bytes
  * already are (never a driver-side loop).
  */
trait CompressedAudioDecoder extends Serializable {
  def name: String

  /** 16-bit mono PCM at the decoder's chosen rate, or a
    * machine-readable rejection reason.
    */
  def decode(bytes: Array[Byte]): Either[String, Pcm]
}

/** ffmpeg-backed [[CompressedAudioDecoder]]: pipes the file through
  * `ffmpeg -i pipe:0 -f s16le -ac 1 -ar <rate> pipe:1` — downmix like
  * the WAV path's `toMono16`, plus rate normalization (the WAV path
  * keeps the native rate; callers normalize with
  * `Augment.resampleLinear` when a uniform rate is required). One
  * process per file like the reference's pydub call. Only constructed when an
  * ffmpeg binary is actually present ([[FfmpegDecoder.ifAvailable]]);
  * in environments without one (like this build sandbox) the gate
  * stays closed and rejected files keep their `reject_reason`.
  */
final class FfmpegDecoder(bin: String, targetRate: Int)
    extends CompressedAudioDecoder {
  def name: String = "ffmpeg"

  def decode(bytes: Array[Byte]): Either[String, Pcm] = {
    import scala.sys.process._
    try {
      val cmd = Seq(bin, "-hide_banner", "-loglevel", "error",
        "-i", "pipe:0", "-f", "s16le", "-ac", "1",
        "-ar", targetRate.toString, "pipe:1")
      val out = new ByteArrayOutputStream()
      val io = new ProcessIO(
        stdin => try stdin.write(bytes) finally stdin.close(),
        stdout => try {
          val buf = new Array[Byte](1 << 16)
          var n = stdout.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = stdout.read(buf) }
        } finally stdout.close(),
        _.close())
      val proc = cmd.run(io)
      if (proc.exitValue() != 0) Left("ffmpeg_decode_failed")
      else if (out.size() == 0) Left("ffmpeg_empty_output")
      else Right(Pcm(out.toByteArray, targetRate))
    } catch {
      case e: Exception => Left(s"ffmpeg_error:${e.getClass.getSimpleName}")
    }
  }
}

object FfmpegDecoder {

  /** A usable ffmpeg binary, if one exists: `GRAFT_FFMPEG` env
    * override first, then the conventional install paths. Returning
    * None (this sandbox has no ffmpeg) keeps the compressed-audio
    * gate closed without failing anything.
    */
  def locate(): Option[String] =
    sys.env.get("GRAFT_FFMPEG")
      .filter(p => new java.io.File(p).canExecute)
      .orElse(Seq("/usr/bin/ffmpeg", "/usr/local/bin/ffmpeg",
        "/opt/homebrew/bin/ffmpeg")
        .find(p => new java.io.File(p).canExecute))

  /** The gated constructor: Some(decoder) iff ffmpeg is present. */
  def ifAvailable(targetRate: Int = 16000): Option[CompressedAudioDecoder] =
    locate().map(new FfmpegDecoder(_, targetRate))
}
