package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import StreamingSessionize._

/** Structured-Streaming sessionization spec: MemoryStream-driven,
  * results compared against the batch W2 semantics.
  */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("session_window groups by time gap with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    // user 1: events at t=0,10,20 then a 2-hour jump
    mem.addData(
      Event(1L, ts(0), 1L, 1.0), Event(1L, ts(10), 2L, 2.0),
      Event(1L, ts(20), 3L, 3.0), Event(1L, ts(7600), 4L, 4.0))
    val q = timeSessions(mem.toDF(), gap = "1 hour")
      .writeStream.format("memory").queryName("tsess")
      .outputMode(OutputMode.Append).start()
    mem.addData(Event(1L, ts(20000), 9L, 0.0)) // push watermark forward
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "SELECT n_events, first_event, last_event, sum_value FROM tsess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // first session (3 events) and second (1 event) must have closed
    assert(rows.contains((3L, 1L, 3L, 6.0)), s"got $rows")
    assert(rows.contains((1L, 4L, 4L, 4.0)), s"got $rows")
  }

  test("dual-predicate flatMapGroupsWithState closes on either gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = dualPredicateSessions(mem.toDS(), maxGapEvents = 5,
        maxGapMicros = 60L * 1000000)
      .writeStream.format("memory").queryName("dsess")
      .outputMode(OutputMode.Append).start()
    // user 1: id gap breaks (6 > 5) despite tiny time gap;
    // user 2: time gap breaks (120 s) despite adjacent ids
    mem.addData(
      Event(1L, ts(0), 1L, 1.0), Event(1L, ts(1), 2L, 1.0),
      Event(1L, ts(2), 8L, 1.0),
      Event(2L, ts(0), 1L, 5.0), Event(2L, ts(120), 2L, 5.0))
    q.processAllAvailable()
    // a later event closes nothing yet (same sessions continue)
    mem.addData(Event(1L, ts(3), 9L, 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "SELECT user_id, first_event, last_event, n_events FROM dsess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows == Set((1L, 1L, 2L, 2L), (2L, 1L, 1L, 1L)), s"got $rows")
  }

  test("batch parity: dual-predicate matches the Sessionize window form") {
    val s = spark
    import s.implicits._
    // deterministic event set, processed in one batch
    val evs = (0 until 50).map { i =>
      Event(i % 3L, ts(i * 40L + (i % 7) * 200), i.toLong, 1.0)
    }
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = dualPredicateSessions(mem.toDS(), maxGapEvents = 5,
        maxGapMicros = 500L * 1000000)
      .writeStream.format("memory").queryName("psess")
      .outputMode(OutputMode.Append).start()
    mem.addData(evs: _*)
    // sentinel events force every real session closed
    mem.addData(Event(0L, ts(100000), 1000L, 0.0),
      Event(1L, ts(100000), 1001L, 0.0), Event(2L, ts(100000), 1002L, 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
      "SELECT user_id, first_event, last_event, n_events FROM psess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // batch reference: lag → boundary → running sum
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = evs.toDF()
      .withColumn("boundary", when(lag($"event_id", 1).over(w).isNull ||
        $"event_id" - lag($"event_id", 1).over(w) > 5 ||
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)) >
          500L * 1000000, 1L).otherwise(0L))
      .withColumn("sid", sum($"boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"event_id").as("first_event"),
        max($"event_id").as("last_event"), count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed == batch, s"\nstreamed: $streamed\nbatch: $batch")
  }

  test("flushed variant: idle session emits on watermark timeout, " +
      "no closing event needed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = dualPredicateSessionsFlushed(mem.toDS().toDF().as[Event],
        maxGapEvents = 5, maxGapMicros = 60L * 1000000,
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("fsess")
      .outputMode(OutputMode.Append).start()
    // user 1's only session: 2 events, then user 1 goes silent forever.
    // (ts=0 exactly would hit the initial-watermark late-row boundary)
    mem.addData(Event(1L, ts(100), 1L, 2.0), Event(1L, ts(105), 2L, 3.0))
    q.processAllAvailable()
    // unrelated user-2 traffic advances the watermark well past
    // user 1's last event + gap (105 + 60 + delay 10 < 1000)
    mem.addData(Event(2L, ts(1000), 50L, 0.0))
    q.processAllAvailable()
    // one more batch so the timeout (evaluated against the new
    // watermark) actually fires
    mem.addData(Event(2L, ts(1001), 51L, 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql(
      "SELECT user_id, first_event, last_event, n_events, sum_value " +
        "FROM fsess WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(rows == Set((1L, 1L, 2L, 2L, 5.0)), s"got $rows")
  }
}
