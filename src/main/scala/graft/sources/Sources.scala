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

  /** S1 — audio scan: `binaryFile` source + RIFF/WAV parse into
    * (path, pcm, sample_rate). Only 16-bit mono PCM wav is decoded
    * natively (the container format the engine itself writes);
    * other codecs are the pluggable-decoder boundary, like model
    * inference. Non-wav bytes → null pcm (filtered out).
    */
  def readWav(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val parse = udf { bytes: Array[Byte] =>
      parseWav(bytes).map(p => (p.bytes, p.sampleRate))
    }
    spark.read.format("binaryFile").load(glob)
      .select($"path", parse($"content").as("wav"))
      .filter($"wav".isNotNull)
      .select($"path", $"wav._1".as("pcm"), $"wav._2".as("sample_rate"))
  }

  /** RIFF/WAV container parse (16-bit mono PCM only). Walks chunks,
    * so extra chunks (LIST, fact…) are tolerated.
    */
  def parseWav(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    if (new String(riff, "US-ASCII") != "RIFF") return None
    buf.getInt // riff size
    val wave = new Array[Byte](4); buf.get(wave)
    if (new String(wave, "US-ASCII") != "WAVE") return None
    var sampleRate = 0
    var fmtOk = false
    while (buf.remaining() >= 8) {
      val id = new Array[Byte](4); buf.get(id)
      val size = buf.getInt
      val name = new String(id, "US-ASCII")
      if (name == "fmt ") {
        val fmt = buf.getShort // 1 = PCM
        val channels = buf.getShort
        sampleRate = buf.getInt
        buf.getInt // byte rate
        buf.getShort // block align
        val bits = buf.getShort
        fmtOk = fmt == 1 && channels == 1 && bits == 16
        buf.position(buf.position() + size - 16)
      } else if (name == "data") {
        if (!fmtOk || size < 0 || size > buf.remaining()) return None
        val pcm = new Array[Byte](size)
        buf.get(pcm)
        return Some(Pcm(pcm, sampleRate))
      } else {
        if (size < 0 || size > buf.remaining()) return None
        buf.position(buf.position() + size)
      }
    }
    None
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

  /** J4 — positional pairing of audio and transcript files by sorted
    * order (gui.py:27–38): deterministic row_number on each side
    * (path order), inner join on position; count mismatch surfaces
    * as dropped rows exactly like the reference's zip.
    */
  def pairByPosition(audio: DataFrame, transcripts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wa = Window.orderBy(col("path"))
    val a = audio.withColumn("pos", row_number().over(wa))
    val t = transcripts.withColumn("pos", row_number().over(wa))
      .withColumnRenamed("path", "text_path")
    a.join(t, "pos")
      .select(col("pos").cast("long").as("doc_id"), col("path"),
        col("text_path"), col("pcm"), col("sample_rate"), col("text"))
  }
}
