package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Sinks, SparkHarness}
import graft.audio.Pcm
import graft.functions.OrderedConcat

/** S1/S2/J4 source round-trips and the A7 ordered-concat Aggregator. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("wav write -> binaryFile scan -> parse round-trips PCM exactly") {
    val dir = Files.createTempDirectory("graft_src").toString
    val p1 = Pcm.fromSamples(Array.tabulate(1000)(i => i % 997), 8000)
    val p2 = Pcm.fromSamples(Array.fill(500)(-1234), 16000)
    Files.write(Paths.get(dir, "a.wav"), Sinks.wavBytes(p1))
    Files.write(Paths.get(dir, "b.wav"), Sinks.wavBytes(p2))
    Files.write(Paths.get(dir, "c.wav"), "not a wav".getBytes)
    val got = Sources.readWav(spark, s"$dir/*.wav")
      .collect().map(r => (r.getString(0).split('/').last,
        r.getAs[Array[Byte]]("pcm"), r.getInt(2))).sortBy(_._1)
    assert(got.length == 2) // junk filtered
    assert(got(0)._1 == "a.wav" && got(0)._2.toSeq == p1.bytes.toSeq &&
      got(0)._3 == 8000)
    assert(got(1)._1 == "b.wav" && got(1)._2.toSeq == p2.bytes.toSeq &&
      got(1)._3 == 16000)
  }

  test("parseWav rejects truncated and non-RIFF payloads") {
    assert(Sources.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Sources.parseWav(new Array[Byte](64)).isEmpty)
    val good = Sinks.wavBytes(Pcm.fromSamples(Array(1, 2, 3), 8000))
    assert(Sources.parseWav(good).exists(_.samples.toSeq == Seq(1, 2, 3)))
    assert(Sources.parseWav(good.dropRight(2)).isEmpty) // data truncated
  }

  test("transcript scan + positional pairing (J4)") {
    val dir = Files.createTempDirectory("graft_src2").toString
    Files.write(Paths.get(dir, "1.wav"),
      Sinks.wavBytes(Pcm.fromSamples(Array(1), 8000)))
    Files.write(Paths.get(dir, "2.wav"),
      Sinks.wavBytes(Pcm.fromSamples(Array(2), 8000)))
    Files.write(Paths.get(dir, "1.txt"), "hello world".getBytes)
    Files.write(Paths.get(dir, "2.txt"), "second text".getBytes)
    val audio = Sources.readWav(spark, s"$dir/*.wav")
    val texts = Sources.readTranscripts(spark, s"$dir/*.txt")
    val paired = Sources.pairByPosition(audio, texts)
      .orderBy("doc_id").collect()
    assert(paired.length == 2)
    assert(paired(0).getAs[String]("text") == "hello world")
    assert(paired(0).getAs[String]("path").endsWith("1.wav"))
    assert(paired(1).getAs[String]("text") == "second text")
  }

  test("OrderedConcat aggregator splices by ord across partition order") {
    val s = spark
    import s.implicits._
    val parts = Seq(
      (1L, 2L, Array[Byte](3, 4)), (1L, 1L, Array[Byte](1, 2)),
      (1L, 3L, Array[Byte](5)), (2L, 1L, Array[Byte](9)))
      .toDS().repartition(4)
    val got = parts
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(OrderedConcat.toColumn.name("full"))
      .collect().map { case (k, v) => k -> v.toSeq }.toMap
    assert(got(1L) == Seq[Byte](1, 2, 3, 4, 5))
    assert(got(2L) == Seq[Byte](9))
  }
}
