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

  /** Backwards-compatible Option form. */
  def parseWav(bytes: Array[Byte]): Option[Pcm] =
    decodeWav(bytes).toOption

  private val WaveFormatPcm = 1
  private val WaveFormatFloat = 3
  private val WaveFormatExtensible = 0xFFFE

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
        buf.getShort // block align
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
        if (codec != WaveFormatPcm && codec != WaveFormatFloat)
          return Left(s"unsupported_codec:wave_fmt_$codec")
        if (channels < 1 || channels > 32)
          return Left(s"unsupported_channels:$channels")
        if (codec == WaveFormatFloat && bits != 32)
          return Left(s"unsupported_bits:float$bits")
        if (codec == WaveFormatPcm && bits != 8 && bits != 16 &&
            bits != 24 && bits != 32)
          return Left(s"unsupported_bits:$bits")
        val data = new Array[Byte](size)
        buf.get(data)
        return Right(toMono16(data, codec, channels, bits, sampleRate))
      } else {
        if (size < 0 || size > buf.remaining()) return Left("truncated")
        buf.position(buf.position() + size)
      }
    }
    Left("no_data_chunk")
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
