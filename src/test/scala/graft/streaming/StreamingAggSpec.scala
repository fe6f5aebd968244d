package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import StreamingSessionize.Event

/** Watermarked window aggregation: tumbling windows close and emit in
  * append mode, late events beyond the watermark are dropped, and the
  * streamed result matches the same operator run in batch.
  */
class StreamingAggSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("tumbling windows emit on watermark close; late data dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingAgg.windowedTotals(mem.toDF(), "user_id",
        watermark = "10 seconds", windowDur = "1 minute")
      .writeStream.format("memory").queryName("wagg")
      .outputMode(OutputMode.Append).start()
    // window [0,60): user 1 twice, user 2 once
    mem.addData(Event(1L, ts(5), 1L, 1.5), Event(2L, ts(20), 2L, 2.5),
      Event(1L, ts(59), 3L, 1.0))
    q.processAllAvailable()
    // advance event time far past the watermark so [0,60) closes...
    mem.addData(Event(1L, ts(300), 4L, 9.0))
    q.processAllAvailable()
    // ...then a LATE event for the closed window: must be dropped
    mem.addData(Event(2L, ts(30), 5L, 100.0))
    mem.addData(Event(1L, ts(600), 6L, 0.5)) // close [300,360) too
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "SELECT window_start, user_id, n_events, sum_value FROM wagg")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000L,
        r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains((0L, 1L, 2L, 2.5)), s"got $rows")
    assert(rows.contains((0L, 2L, 1L, 2.5)), s"got $rows")
    assert(rows.contains((300L, 1L, 1L, 9.0)), s"got $rows")
    // the late event (value=100.0) appears nowhere
    assert(!rows.exists(_._4 == 100.0), s"late event leaked: $rows")
  }

  test("batch parity: same operator over a static frame") {
    val s = spark
    import s.implicits._
    val evs = (0 until 200).map(i =>
      Event(i % 4L, ts(i * 7L), i.toLong, (i % 11) * 0.25))
    val batch = StreamingAgg.windowedTotals(evs.toDF(), "user_id",
        watermark = "10 seconds", windowDur = "1 minute")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingAgg.windowedTotals(mem.toDF(), "user_id",
        watermark = "10 seconds", windowDur = "1 minute")
      .writeStream.format("memory").queryName("wparity")
      .outputMode(OutputMode.Append).start()
    mem.addData(evs: _*)
    mem.addData(Event(0L, ts(99999), 9999L, 0.0)) // close everything real
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "SELECT window_start, user_id, n_events, sum_value FROM wparity")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .filter(_._1 < 99999 * 1000L) // drop the sentinel's own window
      .toSet
    assert(streamed == batch,
      s"\nstreamed-only: ${streamed -- batch}\nbatch-only: ${batch -- streamed}")
  }
}
