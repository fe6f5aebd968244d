package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.audio.Pcm

/** S1/S2 — file sources (SURVEY.md §2.1). The reference shells out to
  * pydub/ffmpeg per file (claude_research_optimal.py:474) and reads
  * transcripts whole (:434); the engine reads both through Spark's
  * distributed file sources, so a million files scan in parallel and
  * doc ids assign deterministically from paths.
  */
object Sources {

  /** S1 — audio scan: `binaryFile` source + RIFF/WAV decode into
    * (path, pcm, sample_rate, reject_reason). PCM 8/16/24/32-bit and
    * 32-bit float, any channel count (downmixed by averaging),
    * including WAVE_FORMAT_EXTENSIBLE — everything is normalized to
    * the engine's internal 16-bit mono representation. Files the
    * decoder cannot handle (mp3/m4a/…, the reference accepts them via
    * ffmpeg — gui.py:97-99) keep a per-file `reject_reason` so a batch
    * fails LOUDLY per file instead of silently shrinking; compressed
    * codecs are the pluggable-decoder boundary, like model inference.
    */
  def readWavOrReject(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val parse = udf { bytes: Array[Byte] =>
      decodeWav(bytes) match {
        case Right(p) => (p.bytes, p.sampleRate, null: String)
        case Left(reason) => (null: Array[Byte], 0, reason)
      }
    }
    spark.read.format("binaryFile").load(glob)
      .select($"path", parse($"content").as("wav"))
      .select($"path", $"wav._1".as("pcm"), $"wav._2".as("sample_rate"),
        $"wav._3".as("reject_reason"))
  }

  /** Decoded rows only (S1 happy path). */
  def readWav(spark: SparkSession, glob: String): DataFrame =
    readWavOrReject(spark, glob)
      .filter(col("reject_reason").isNull)
      .drop("reject_reason")

  /** [[readWavOrReject]] with the compressed-codec gate open: files
    * the WAV decoder rejects are retried through `fallback` (e.g.
    * [[FfmpegDecoder.ifAvailable]]) before keeping their rejection.
    * With `fallback = None` this is exactly [[readWavOrReject]] — the
    * closed-gate form this sandbox runs; a deployment with ffmpeg
    * installed passes `FfmpegDecoder.ifAvailable()` and mp3/m4a rows
    * flow down the same (path, pcm, sample_rate) contract. The
    * decoder instance rides the task closure: decode happens on the
    * executor holding the file bytes, one process per file like the
    * reference's pydub call — never a driver-side loop.
    */
  def readAudioOrReject(spark: SparkSession, glob: String,
      fallback: Option[CompressedAudioDecoder]): DataFrame = {
    import spark.implicits._
    val parse = udf { bytes: Array[Byte] =>
      (decodeWav(bytes), fallback) match {
        case (Right(p), _) => (p.bytes, p.sampleRate, null: String)
        case (Left(reason), Some(dec)) => dec.decode(bytes) match {
          case Right(p) => (p.bytes, p.sampleRate, null: String)
          case Left(fbReason) =>
            (null: Array[Byte], 0, s"$reason;${dec.name}:$fbReason")
        }
        case (Left(reason), None) => (null: Array[Byte], 0, reason)
      }
    }
    spark.read.format("binaryFile").load(glob)
      .select($"path", parse($"content").as("wav"))
      .select($"path", $"wav._1".as("pcm"), $"wav._2".as("sample_rate"),
        $"wav._3".as("reject_reason"))
  }

  /** The rejection side-output: (path, reject_reason) per bad file. */
  def rejectedAudio(spark: SparkSession, glob: String): DataFrame =
    readWavOrReject(spark, glob)
      .filter(col("reject_reason").isNotNull)
      .select(col("path"), col("reject_reason"))

  /** [[rejectedAudio]] enriched through the pure-JVM
    * [[Mp3Frames]] frame-header parser: rows whose bytes sniff as
    * mp3 carry the full stream geometry (frames, sample rate,
    * duration, CBR/VBR) or a structural parse error — so the
    * "unsupported_codec:mp3" branch is exercised against REAL mp3
    * frame arithmetic even in a decoder-less environment, and an
    * operator triaging a 100 TB ingest can split "valid mp3s worth
    * routing to a decode fleet" from sync-colliding garbage without
    * ffmpeg. Non-mp3 rejects pass through with null mp3 columns.
    */
  def rejectedAudioDetailed(spark: SparkSession, glob: String)
      : DataFrame = {
    import spark.implicits._
    val probe = udf { bytes: Array[Byte] =>
      decodeWav(bytes) match {
        case Right(_) => null
        case Left(reason) =>
          if (Mp3Frames.sniff(bytes)) Mp3Frames.parse(bytes) match {
            case Right(i) => (reason, null: String, i.version,
              i.frames, i.sampleRate, i.channels, i.durationMs,
              i.bitrateKbpsMin, i.bitrateKbpsMax, i.vbr)
            case Left(err) => (reason, err, null: String, 0, 0, 0, 0L,
              0, 0, false)
          }
          else (reason, null: String, null: String, 0, 0, 0, 0L, 0, 0,
            false)
      }
    }
    spark.read.format("binaryFile").load(glob)
      .select($"path", probe($"content").as("r"))
      .filter($"r".isNotNull)
      .select($"path", $"r._1".as("reject_reason"),
        $"r._2".as("mp3_parse_error"), $"r._3".as("mp3_version"),
        $"r._4".as("mp3_frames"), $"r._5".as("mp3_sample_rate"),
        $"r._6".as("mp3_channels"), $"r._7".as("mp3_duration_ms"),
        $"r._8".as("mp3_kbps_min"), $"r._9".as("mp3_kbps_max"),
        $"r._10".as("mp3_vbr"))
  }

  /** Backwards-compatible Option form. */
  def parseWav(bytes: Array[Byte]): Option[Pcm] =
    decodeWav(bytes).toOption

  private val WaveFormatPcm = 1
  private val WaveFormatFloat = 3
  private val WaveFormatAlaw = 6
  private val WaveFormatUlaw = 7
  private val WaveFormatImaAdpcm = 0x11
  private val WaveFormatExtensible = 0xFFFE

  /** G.711 μ-law decode table (ITU-T G.711, the CCITT ulaw2linear
    * form): u = ~b; t = ((u & 0xF) << 3) + 0x84 shifted by the 3-bit
    * segment; sign from bit 7. Compressed telephony audio is the one
    * codec family decodable EXACTLY in pure JVM — the engine's
    * no-ffmpeg compressed-audio leg (reference accepts such files via
    * pydub, claude_research_optimal.py:474).
    */
  private[sources] val UlawTable: Array[Int] = Array.tabulate(256) { b =>
    val u = ~b & 0xFF
    val t = (((u & 0xF) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law decode table (alaw2linear): a = b ^ 0x55; segment 0
    * → (mant<<4)+8, else ((mant<<4)+0x108) << (seg−1); bit 7 SET is
    * positive (A-law convention, opposite of μ-law).
    */
  private[sources] val AlawTable: Array[Int] = Array.tabulate(256) { b =>
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0xF) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case s => (t0 + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  private val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  private val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** RIFF/WAV container decode. Walks chunks (LIST, fact… tolerated);
    * returns 16-bit mono PCM or a machine-readable rejection reason.
    */
  def decodeWav(bytes: Array[Byte]): Either[String, Pcm] = {
    if (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3')
      return Left("unsupported_codec:mp3")
    if (bytes.length >= 12 && new String(bytes, 4, 4, "US-ASCII") == "ftyp")
      return Left("unsupported_container:mp4")
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xE0) == 0xE0)
      return Left("unsupported_codec:mp3")
    if (bytes.length < 44) return Left("truncated")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    if (new String(riff, "US-ASCII") != "RIFF") return Left("not_riff")
    buf.getInt // riff size
    val wave = new Array[Byte](4); buf.get(wave)
    if (new String(wave, "US-ASCII") != "WAVE") return Left("not_wave")
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var codec = -1
    var blockAlign = 0
    var haveFmt = false
    while (buf.remaining() >= 8) {
      val id = new Array[Byte](4); buf.get(id)
      val size = buf.getInt
      val name = new String(id, "US-ASCII")
      if (name == "fmt ") {
        if (size < 16 || size > buf.remaining()) return Left("bad_fmt_chunk")
        val fmtEnd = buf.position() + size
        codec = buf.getShort & 0xFFFF
        channels = buf.getShort & 0xFFFF
        sampleRate = buf.getInt
        buf.getInt // byte rate
        blockAlign = buf.getShort & 0xFFFF
        bits = buf.getShort & 0xFFFF
        if (codec == WaveFormatExtensible && size >= 40) {
          buf.getShort // cbSize
          buf.getShort // valid bits
          buf.getInt // channel mask
          codec = buf.getShort & 0xFFFF // GUID's leading format code
        }
        buf.position(fmtEnd)
        haveFmt = true
      } else if (name == "data") {
        if (!haveFmt) return Left("data_before_fmt")
        if (size < 0 || size > buf.remaining()) return Left("truncated")
        if (codec != WaveFormatPcm && codec != WaveFormatFloat &&
            codec != WaveFormatAlaw && codec != WaveFormatUlaw &&
            codec != WaveFormatImaAdpcm)
          return Left(s"unsupported_codec:wave_fmt_$codec")
        if (channels < 1 || channels > 32)
          return Left(s"unsupported_channels:$channels")
        if (codec == WaveFormatFloat && bits != 32)
          return Left(s"unsupported_bits:float$bits")
        if (codec == WaveFormatPcm && bits != 8 && bits != 16 &&
            bits != 24 && bits != 32)
          return Left(s"unsupported_bits:$bits")
        if ((codec == WaveFormatAlaw || codec == WaveFormatUlaw) &&
            bits != 8)
          return Left(s"unsupported_bits:g711_$bits")
        if (codec == WaveFormatImaAdpcm && bits != 4)
          return Left(s"unsupported_bits:ima_$bits")
        val data = new Array[Byte](size)
        buf.get(data)
        if (codec == WaveFormatAlaw || codec == WaveFormatUlaw)
          return Right(g711ToMono16(data,
            if (codec == WaveFormatUlaw) UlawTable else AlawTable,
            channels, sampleRate))
        if (codec == WaveFormatImaAdpcm) {
          if (blockAlign < 4 * channels + 4)
            return Left(s"bad_block_align:$blockAlign")
          return Right(adpcmToMono16(data, channels, blockAlign,
            sampleRate))
        }
        return Right(toMono16(data, codec, channels, bits, sampleRate))
      } else {
        if (size < 0 || size > buf.remaining()) return Left("truncated")
        buf.position(buf.position() + size)
      }
    }
    Left("no_data_chunk")
  }

  /** G.711 (μ-law/A-law) to 16-bit mono: one table lookup per byte,
    * channel-averaged like every other path. 2:1 logarithmic
    * compression decoded bit-exactly — no external binary.
    */
  private def g711ToMono16(data: Array[Byte], tab: Array[Int],
      channels: Int, sampleRate: Int): Pcm = {
    val n = data.length / channels
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var c = 0
      while (c < channels) {
        acc += tab(data(i * channels + c) & 0xFF)
        c += 1
      }
      out(i) = (acc / channels).toInt
      i += 1
    }
    Pcm.fromSamples(out, sampleRate)
  }

  /** IMA/DVI ADPCM (wave format 0x11) to 16-bit mono: 4:1-compressed
    * blocks — per channel a 4-byte header (int16 predictor = the
    * block's first sample, step index), then nibbles in 4-byte
    * channel-interleaved groups; the standard step/index state
    * machine (IMA ADPCM spec, 1992) reconstructs samples exactly.
    */
  private def adpcmToMono16(data: Array[Byte], channels: Int,
      blockAlign: Int, sampleRate: Int): Pcm = {
    val spb = (blockAlign - 4 * channels) * 2 / channels + 1
    val nBlocks = data.length / blockAlign
    val out = new Array[Int](nBlocks * spb)
    var outN = 0
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    val chanSamples = Array.ofDim[Int](channels, spb)
    var b = 0
    while (b < nBlocks) {
      val base = b * blockAlign
      var c = 0
      while (c < channels) {
        val off = base + 4 * c
        pred(c) = ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort.toInt
        idx(c) = math.max(0, math.min(88, data(off + 2) & 0xFF))
        chanSamples(c)(0) = pred(c)
        c += 1
      }
      // nibble payload: groups of 4 bytes (8 samples) per channel,
      // channels interleaved group-wise; low nibble first
      var s = 1
      var payload = base + 4 * channels
      while (s < spb) {
        var cc = 0
        while (cc < channels) {
          var k = 0
          while (k < 8 && s + k < spb) {
            val byte = data(payload + (k >> 1)) & 0xFF
            val nib = if ((k & 1) == 0) byte & 0xF else (byte >> 4) & 0xF
            val step = AdpcmStepTable(idx(cc))
            var diff = step >> 3
            if ((nib & 1) != 0) diff += step >> 2
            if ((nib & 2) != 0) diff += step >> 1
            if ((nib & 4) != 0) diff += step
            val p = if ((nib & 8) != 0) pred(cc) - diff else pred(cc) + diff
            pred(cc) = math.max(-32768, math.min(32767, p))
            idx(cc) = math.max(0,
              math.min(88, idx(cc) + AdpcmIndexTable(nib)))
            chanSamples(cc)(s + k) = pred(cc)
            k += 1
          }
          payload += 4
          cc += 1
        }
        s += 8
      }
      var i = 0
      while (i < spb) {
        var acc = 0L
        var c2 = 0
        while (c2 < channels) { acc += chanSamples(c2)(i); c2 += 1 }
        out(outN) = (acc / channels).toInt
        outN += 1
        i += 1
      }
      b += 1
    }
    Pcm.fromSamples(out, sampleRate)
  }

  /** Normalize any supported sample format to 16-bit mono: decode each
    * frame's channels, average (integer floor), scale to 16 bits.
    */
  private def toMono16(data: Array[Byte], codec: Int, channels: Int,
      bits: Int, sampleRate: Int): Pcm = {
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val n = data.length / frameBytes
    val out = new Array[Int](n)
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      var acc = 0L
      var c = 0
      while (c < channels) {
        val off = i * frameBytes + c * bytesPerSample
        val v: Int =
          if (codec == WaveFormatFloat) {
            val f = buf.getFloat(off)
            val clamped = math.max(-1.0f, math.min(1.0f, f))
            math.round(clamped * 32767.0f)
          } else bits match {
            case 8 => ((data(off) & 0xFF) - 128) << 8 // unsigned midpoint
            case 16 => buf.getShort(off).toInt
            case 24 =>
              val raw = (data(off) & 0xFF) | ((data(off + 1) & 0xFF) << 8) |
                (data(off + 2) << 16) // top byte keeps sign
              raw >> 8
            case 32 => buf.getInt(off) >> 16
          }
        acc += v
        c += 1
      }
      out(i) = (acc / channels).toInt
      i += 1
    }
    Pcm.fromSamples(out, sampleRate)
  }

  /** S2b — JSONL corpus ingest with a corrupt-record side channel:
    * line-delimited JSON is the de-facto interchange format for LLM
    * corpora (Dolma, RedPajama, The Pile all ship it), and at 100 TB
    * a malformed line is a certainty — so the reader runs PERMISSIVE
    * with `_corrupt_record` captured, splitting into (clean rows
    * matching `schema`, reject rows carrying the raw line) exactly
    * like [[readWavOrReject]]'s reject_reason channel: a bad byte
    * never kills the batch and never silently disappears.
    *
    * Scale shape: JSONL is splittable (newline-framed), so the scan
    * parallelizes per block; both outputs are projections of the one
    * scan.
    */
  def readJsonlOrReject(spark: SparkSession, glob: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ StructField("_corrupt_record", StringType,
        nullable = true))
    // text scan + from_json (not DataFrameReader.json + cache): the
    // json reader forbids referencing its internal corrupt column
    // without materializing, and a .cache() here would pin the whole
    // corpus in cluster storage memory with no one to unpersist it.
    // from_json's corrupt field is a plain struct field, so both
    // outputs are independent lazy projections of a splittable text
    // scan — no cached state, each side column-pruned. Blank lines
    // are skipped like the json reader does.
    val parsed = spark.read.text(glob)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"),
        from_json(col("raw_line"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__p"))
    val clean = parsed
      .filter(col("__p._corrupt_record").isNull && col("__p").isNotNull)
      .select(schema.fieldNames.toSeq
        .map(f => col(s"__p.`$f`").as(f)): _*)
    val rejects = parsed
      .filter(col("__p._corrupt_record").isNotNull || col("__p").isNull)
      .select(col("raw_line"))
    (clean, rejects)
  }

  /** S2 — transcript scan: one row per file, whole text
    * (reference `Path.read_text`, claude_research_optimal.py:434).
    */
  def readTranscripts(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", true).text(glob)
      .withColumn("path", input_file_name())
      .select($"path", $"value".as("text"))
  }

  /** Global 1-based rank by `path` WITHOUT a global window: a global
    * window (`Window.orderBy` with no partition) would pull every row
    * into one task. Instead: distributed range-partitioned sort, then
    * `zipWithIndex` (one lightweight extra job to count partition
    * sizes, indices assigned partition-locally) — scales to millions
    * of files.
    */
  private def withGlobalPos(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(col("path"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "pos", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** J4 — positional pairing of audio and transcript files by sorted
    * order (gui.py:27–38): deterministic global rank on each side
    * (path order), inner join on position; count mismatch surfaces
    * as dropped rows exactly like the reference's zip.
    */
  def pairByPosition(audio: DataFrame, transcripts: DataFrame): DataFrame = {
    val a = withGlobalPos(audio)
    val t = withGlobalPos(transcripts)
      .withColumnRenamed("path", "text_path")
    a.join(t, "pos")
      .select(col("pos").as("doc_id"), col("path"),
        col("text_path"), col("pcm"), col("sample_rate"), col("text"))
  }
}
