package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.audio.{AudioQa, Pcm}
import graft.operators.CorpusOps

/** Streaming X353/X357 twins: the cumulative QA panels after N
  * micro-batches must equal the batch operators over the concatenated
  * stream (exact integer counters — identity, not approximation).
  */
class StreamingQaSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("streaming ablation matrix == batch filterAblation over the " +
    "concatenated stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val lens = (1 to 300).map(i => ((i * 37) % 500).toLong)
    val gates = Seq(
      "short" -> (col("len") < 100),
      "long" -> (col("len") > 400),
      "mid" -> (col("len").between(150, 350)))

    val tracker = new StreamingQa.AblationTracker(gates)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("len").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        tracker.update(batch)
        ()
      }.start()
    Seq(lens.take(100), lens.slice(100, 180), lens.drop(180))
      .foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val want = CorpusOps.filterAblation(lens.toDF("len"), gates)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)))).toMap
    val got = tracker.matrix().map(r => (r.getString(1), r.getString(2)) ->
      (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
        Option(r.get(6)))).toMap
    assert(got == want)
    assert(tracker.n == 300)
  }

  test("streaming clip panel == batch AudioQa over every clip; " +
    "cross-batch longest run is the per-clip max") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clips: Seq[Seq[Int]] = Seq(
      Seq(0, 32767, 32767, 5),          // run 2
      Seq(1, 2, 3),                     // clean
      Seq(-32767, -32767, -32767, 9),   // run 3
      Seq(32767, 0, 32767))             // runs of 1
    val tracker = new StreamingQa.ClipTracker()
    val mem = MemoryStream[Seq[Int]]
    val q = mem.toDF().toDF("pcm").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        tracker.update(batch, "pcm")
        ()
      }.start()
    Seq(clips.take(2), clips.drop(2)).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val kernel = clips.map(c =>
      AudioQa.clipping(Pcm.fromSamples(c.toArray, 16000)))
    assert(tracker.nClipped == kernel.map(_._1).sum)
    assert(tracker.longestRun == kernel.map(_._2).max)
    assert(tracker.nSamples == clips.map(_.size.toLong).sum)
    assert(tracker.clipRatio ==
      kernel.map(_._1).sum.toDouble / clips.map(_.size).sum)
  }
}
