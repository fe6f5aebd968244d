package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r13: the pure-JVM MPEG frame-header parser — the in-sandbox half
  * of the compressed-audio gate. Streams here are REAL mp3 byte
  * streams (structurally valid frame headers + lengths per
  * ISO/IEC 11172-3 §2.4.1.3 / 13818-3; payload bytes arbitrary since
  * nothing decodes them), hand-assembled the same way the BMP/WAV
  * codec specs assemble their containers.
  */
class Mp3FramesSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  /** One MPEG frame: real 4-byte header + deterministic payload. */
  private def frame(ver: Int, layer: Int, brIdx: Int, srIdx: Int,
      padding: Int, mono: Boolean): Array[Byte] = {
    val b1 = 0xE0 | (ver << 3) | (layer << 1) | 1 // no CRC
    val b2 = (brIdx << 4) | (srIdx << 2) | (padding << 1)
    val b3 = if (mono) 0xC0 else 0x00
    val kbpsTab: Array[Int] = (ver, layer) match {
      case (3, 1) => Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320) // MPEG1 L3
      case (_, 1) => Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
        112, 128, 144, 160) // MPEG2/2.5 L3
      case _ => sys.error("unsupported in this helper")
    }
    val srTab = ver match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    }
    val kbps = kbpsTab(brIdx)
    val sr = srTab(srIdx)
    val len =
      if (ver == 3) 144 * kbps * 1000 / sr + padding
      else 72 * kbps * 1000 / sr + padding
    val out = new Array[Byte](len)
    out(0) = 0xFF.toByte
    out(1) = b1.toByte
    out(2) = b2.toByte
    out(3) = b3.toByte
    var i = 4
    while (i < len) { out(i) = ((i * 31) % 251).toByte; i += 1 }
    out
  }

  private def id3v2(payload: Int): Array[Byte] = {
    val out = new Array[Byte](10 + payload)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'
    out(3) = 4; out(4) = 0; out(5) = 0 // v2.4, no flags
    // syncsafe size
    out(6) = ((payload >> 21) & 0x7F).toByte
    out(7) = ((payload >> 14) & 0x7F).toByte
    out(8) = ((payload >> 7) & 0x7F).toByte
    out(9) = (payload & 0x7F).toByte
    out
  }

  private def concat(parts: Array[Byte]*): Array[Byte] =
    parts.toArray.flatten

  test("CBR MPEG1 Layer III stereo stream with an ID3v2 tag parses " +
    "to exact geometry") {
    // 128 kbps @ 44100: frame length 144*128000/44100 = 417 (floor)
    val s = concat(id3v2(57) +:
      (0 until 10).map(_ => frame(3, 1, 9, 0, 0, mono = false)): _*)
    val info = Mp3Frames.parse(s).fold(e => fail(s"rejected: $e"),
      identity)
    assert(info.version == "MPEG1" && info.layer == 3)
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.frames == 10 && info.samples == 11520L)
    assert(info.durationMs == 11520L * 1000 / 44100)
    assert(info.bitrateKbpsMin == 128 && info.bitrateKbpsMax == 128)
    assert(!info.vbr && info.id3v2Bytes == 67)
    // padding bit lengthens a frame by exactly one byte
    val padded = concat(frame(3, 1, 9, 0, 1, mono = false),
      frame(3, 1, 9, 0, 0, mono = false))
    assert(Mp3Frames.parse(padded).exists(_.frames == 2))
  }

  test("VBR stream reports the bitrate span; MPEG2.5 mono low-rate " +
    "stream uses the 72-factor length and 576-sample frames") {
    val vbr = concat(frame(3, 1, 9, 0, 0, mono = false),
      frame(3, 1, 12, 0, 0, mono = false),
      frame(3, 1, 14, 0, 0, mono = false))
    val vi = Mp3Frames.parse(vbr).toOption.get
    assert(vi.vbr && vi.bitrateKbpsMin == 128 && vi.bitrateKbpsMax == 320)
    // MPEG2.5 (ver bits 0), 16 kbps @ 8000 Hz mono: 72*16000/8000=144
    val lo = concat((0 until 4).map(_ =>
      frame(0, 1, 2, 2, 0, mono = true)): _*)
    val li = Mp3Frames.parse(lo).toOption.get
    assert(li.version == "MPEG2.5" && li.sampleRate == 8000)
    assert(li.channels == 1 && li.frames == 4 && li.samples == 4 * 576L)
  }

  test("trailing ID3v1 tag tolerated; structural violations reject " +
    "with typed reasons") {
    val tag = {
      val t = new Array[Byte](128)
      t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
      t
    }
    val withTag = concat(frame(3, 1, 9, 0, 0, mono = false), tag)
    assert(Mp3Frames.parse(withTag).exists(_.frames == 1))
    // truncated final frame
    val trunc = concat(frame(3, 1, 9, 0, 0, mono = false),
      frame(3, 1, 9, 0, 0, mono = false).take(100))
    assert(Mp3Frames.parse(trunc) == Left("mp3_truncated_frame"))
    // sync-colliding garbage: 0xFF 0xEx then bad bitrate index 15
    val garbage = Array[Byte](0xFF.toByte, 0xFB.toByte, 0xF0.toByte,
      0x00, 0x00, 0x00, 0x00, 0x00)
    assert(Mp3Frames.parse(garbage) == Left("mp3_bad_bitrate_index"))
    // reserved version bits
    val resVer = Array(0xFF.toByte, 0xEB.toByte, 0x90.toByte, 0x00.toByte)
    assert(Mp3Frames.parse(resVer) == Left("mp3_reserved_version"))
    // ID3 tag with nothing after it
    assert(Mp3Frames.parse(id3v2(5)) == Left("mp3_only_id3_tag"))
    // mid-stream codec switch (44.1k frame then 48k frame)
    val mixed = concat(frame(3, 1, 9, 0, 0, mono = false),
      frame(3, 1, 9, 1, 0, mono = false))
    assert(Mp3Frames.parse(mixed) == Left("mp3_inconsistent_stream"))
    // non-mp3 bytes never reach the walker
    assert(Mp3Frames.parse("RIFFxxxx".getBytes) == Left("mp3_no_sync"))
  }

  test("decodeWav still rejects a REAL mp3 stream with the pinned " +
    "taxonomy reason (routing unchanged)") {
    val real = concat(id3v2(20) +:
      (0 until 3).map(_ => frame(3, 1, 9, 0, 0, mono = false)): _*)
    assert(Sources.decodeWav(real) == Left("unsupported_codec:mp3"))
    val bare = frame(3, 1, 9, 0, 0, mono = false)
    assert(Sources.decodeWav(bare) == Left("unsupported_codec:mp3"))
  }

  test("rejectedAudioDetailed E2E: real mp3s carry stream geometry, " +
    "garbage carries a parse error, m4a passes through with null " +
    "mp3 columns") {
    val dir = Files.createTempDirectory("mp3detail").toString
    Files.write(Paths.get(dir, "real.mp3"), concat(id3v2(10) +:
      (0 until 5).map(_ => frame(3, 1, 9, 0, 0, mono = false)): _*))
    Files.write(Paths.get(dir, "junk.mp3"), Array(0xFF.toByte,
      0xFB.toByte, 0xF0.toByte, 0x00.toByte, 0x11.toByte))
    val ftyp = "....ftypM4A ........".getBytes("US-ASCII")
    Files.write(Paths.get(dir, "a.m4a"), ftyp)
    val rows = Sources.rejectedAudioDetailed(spark, s"$dir/*")
      .collect()
      .map(r => r.getAs[String]("path").split('/').last -> r).toMap
    assert(rows.size == 3)
    val real = rows("real.mp3")
    assert(real.getAs[String]("reject_reason") == "unsupported_codec:mp3")
    assert(real.getAs[String]("mp3_parse_error") == null)
    assert(real.getAs[String]("mp3_version") == "MPEG1")
    assert(real.getAs[Int]("mp3_frames") == 5)
    assert(real.getAs[Int]("mp3_sample_rate") == 44100)
    assert(real.getAs[Long]("mp3_duration_ms") == 5 * 1152L * 1000 / 44100)
    val junk = rows("junk.mp3")
    assert(junk.getAs[String]("mp3_parse_error") == "mp3_bad_bitrate_index")
    assert(junk.getAs[String]("mp3_version") == null)
    val m4a = rows("a.m4a")
    assert(m4a.getAs[String]("reject_reason") == "unsupported_container:mp4")
    assert(m4a.getAs[String]("mp3_parse_error") == null)
    assert(m4a.getAs[String]("mp3_version") == null)
  }
}
