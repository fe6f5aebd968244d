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

/** Parsed MPEG-audio stream summary — everything a pipeline can know
  * about an mp3 WITHOUT a decoder: stream geometry, duration, and
  * CBR/VBR shape. `id3v2_bytes` is the skipped leading tag size.
  */
final case class Mp3Info(
    version: String, // "MPEG1" | "MPEG2" | "MPEG2.5"
    layer: Int, // 1..3
    sampleRate: Int,
    channels: Int, // 1 (mono mode) or 2
    frames: Int,
    samples: Long,
    durationMs: Long,
    bitrateKbpsMin: Int,
    bitrateKbpsMax: Int,
    vbr: Boolean,
    id3v2Bytes: Int)

/** Pure-JVM MPEG-audio FRAME-HEADER parser (not a decoder): walks the
  * ID3v2 tag and every frame header of an mp3 byte stream, validating
  * sync/version/layer/bitrate/sample-rate fields and the per-frame
  * length arithmetic from the public MPEG-1/2/2.5 audio spec
  * (ISO/IEC 11172-3 §2.4.1.3, 13818-3). This is the in-sandbox half
  * of the compressed-audio gate: the routing decision ("these bytes
  * ARE a structurally valid mp3 stream" vs "random bytes that happen
  * to start with 0xFFEx") runs against real mp3 bytes even where no
  * ffmpeg exists to decode the payload — the reference's pydub path
  * (claude_research_optimal.py:474, gui.py:97-99) accepts such files
  * whole, so the side-output can carry real stream metadata instead
  * of a bare magic-byte verdict.
  */
object Mp3Frames {

  // kbps by [versionGroup(0=MPEG1,1=MPEG2/2.5)][layer-1][index 1..14]
  private val Bitrates: Array[Array[Array[Int]]] = Array(
    Array( // MPEG1
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
        384, 416, 448), // Layer I
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320, 384), // Layer II
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
        256, 320)), // Layer III
    Array( // MPEG2 / 2.5
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
        224, 256), // Layer I
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
        160), // Layer II
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
        160))) // Layer III

  private val SampleRates: Map[String, Array[Int]] = Map(
    "MPEG1" -> Array(44100, 48000, 32000),
    "MPEG2" -> Array(22050, 24000, 16000),
    "MPEG2.5" -> Array(11025, 12000, 8000))

  /** Do these bytes LOOK like mp3 (ID3v2 tag or frame sync)? The
    * same two tests [[Sources.decodeWav]] rejects on.
    */
  def sniff(bytes: Array[Byte]): Boolean =
    (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') ||
    (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xE0) == 0xE0)

  /** Syncsafe 28-bit ID3v2 size (7 data bits per byte). */
  private def id3v2Size(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7F) << 21) | ((b(off + 1) & 0x7F) << 14) |
      ((b(off + 2) & 0x7F) << 7) | (b(off + 3) & 0x7F)

  /** Walk every frame; Left(reason) on structural violations. A
    * trailing ID3v1 "TAG" block (128 bytes) is tolerated; any other
    * trailing bytes (>= 4) or a frame overrunning the buffer is a
    * truncation error — the strictness is the point, it separates
    * real streams from sync-colliding garbage.
    */
  def parse(bytes: Array[Byte]): Either[String, Mp3Info] = {
    if (!sniff(bytes)) return Left("mp3_no_sync")
    var pos = 0
    var id3 = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      id3 = 10 + id3v2Size(bytes, 6)
      pos = id3
      if (pos >= bytes.length) return Left("mp3_only_id3_tag")
    }
    var frames = 0
    var samples = 0L
    var version: String = null
    var layer = 0
    var sampleRate = 0
    var channels = 0
    var brMin = Int.MaxValue
    var brMax = 0
    while (pos < bytes.length) {
      val left = bytes.length - pos
      if (left < 4) {
        return if (frames > 0) Left("mp3_trailing_garbage")
        else Left("mp3_truncated_header")
      }
      // tolerated trailer: ID3v1 tag, exactly 128 bytes
      if (left == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        if (frames == 0) return Left("mp3_no_frames")
        return done(version, layer, sampleRate, channels, frames,
          samples, brMin, brMax, id3)
      }
      val b0 = bytes(pos) & 0xFF
      val b1 = bytes(pos + 1) & 0xFF
      val b2 = bytes(pos + 2) & 0xFF
      val b3 = bytes(pos + 3) & 0xFF
      if (b0 != 0xFF || (b1 & 0xE0) != 0xE0)
        return Left(if (frames == 0) "mp3_no_sync" else "mp3_lost_sync")
      val ver = (b1 >> 3) & 3 match {
        case 0 => "MPEG2.5"
        case 1 => return Left("mp3_reserved_version")
        case 2 => "MPEG2"
        case _ => "MPEG1"
      }
      val lay = (b1 >> 1) & 3 match {
        case 0 => return Left("mp3_reserved_layer")
        case 1 => 3
        case 2 => 2
        case _ => 1
      }
      val brIdx = (b2 >> 4) & 15
      if (brIdx == 0) return Left("mp3_free_bitrate_unsupported")
      if (brIdx == 15) return Left("mp3_bad_bitrate_index")
      val srIdx = (b2 >> 2) & 3
      if (srIdx == 3) return Left("mp3_reserved_samplerate")
      val padding = (b2 >> 1) & 1
      val mode = (b3 >> 6) & 3
      val vg = if (ver == "MPEG1") 0 else 1
      val kbps = Bitrates(vg)(lay - 1)(brIdx)
      val sr = SampleRates(ver)(srIdx)
      if (frames == 0) {
        version = ver; layer = lay; sampleRate = sr
        channels = if (mode == 3) 1 else 2
      } else if (ver != version || lay != layer || sr != sampleRate) {
        return Left("mp3_inconsistent_stream")
      }
      val frameLen =
        if (lay == 1) (12 * kbps * 1000 / sr + padding) * 4
        else if (lay == 3 && vg == 1) 72 * kbps * 1000 / sr + padding
        else 144 * kbps * 1000 / sr + padding
      if (frameLen < 4) return Left("mp3_bad_frame_length")
      if (pos + frameLen > bytes.length) return Left("mp3_truncated_frame")
      samples +=
        (if (lay == 1) 384 else if (lay == 2) 1152
         else if (vg == 1) 576 else 1152)
      brMin = math.min(brMin, kbps)
      brMax = math.max(brMax, kbps)
      frames += 1
      pos += frameLen
    }
    if (frames == 0) Left("mp3_no_frames")
    else done(version, layer, sampleRate, channels, frames, samples,
      brMin, brMax, id3)
  }

  private def done(version: String, layer: Int, sampleRate: Int,
      channels: Int, frames: Int, samples: Long, brMin: Int,
      brMax: Int, id3: Int): Either[String, Mp3Info] =
    Right(Mp3Info(version, layer, sampleRate, channels, frames,
      samples, samples * 1000L / sampleRate, brMin, brMax,
      brMin != brMax, id3))
}
