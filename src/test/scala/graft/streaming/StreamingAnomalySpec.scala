package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.TimeSeries

/** Streaming X112 must emit BIT-IDENTICAL rows to the batch operator
  * over the concatenated input, no matter how the stream is cut into
  * micro-batches — the trailing reference window rides the keyed
  * state across batch boundaries.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ev(id: Long, u: Long, v: Double): StreamingAnomaly.Event =
    StreamingAnomaly.Event(u, new java.sql.Timestamp(1700000000000L +
      id * 60000), id, v)

  test("stateful streaming z-score == batch operator across batch cuts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // two users, interleaved; user 1 gets a spike at id 40, user 2
    // stays steady-ish with a dip at id 47
    val all = (0L until 24L).flatMap { i =>
      Seq(ev(i * 2, 1L, 10.0 + (i % 5)), ev(i * 2 + 1, 2L, 50.0 - (i % 3)))
    } ++ Seq(ev(40L + 8, 1L, 99.99), ev(47L + 8, 2L, 1.01))
    val sorted = all.sortBy(_.event_id)
    val cuts = Seq(sorted.take(11), sorted.slice(11, 30), sorted.drop(30))

    val mem = MemoryStream[StreamingAnomaly.Event]
    val outTable = "anomaly_parity_out"
    val q = StreamingAnomaly.rollingZScore(mem.toDS(), lookback = 20,
        minN = 10, threshold = 3.0)
      .writeStream.format("memory").queryName(outTable)
      .outputMode("append").start()
    cuts.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = s.table(outTable).collect().map { r =>
      r.getAs[Long]("event_id") -> ((r.getAs[Long]("n_ref"),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue()),
        r.getAs[Boolean]("is_anomaly")))
    }.toMap

    val batchDf = s.createDataFrame(sorted.map(e =>
      (e.event_id, e.user_id, e.ts, e.value)))
      .toDF("event_id", "user_id", "ts", "value")
    val want = TimeSeries.rollingZScore(batchDf, "user_id", "ts",
        "event_id", "value", lookback = 20, minN = 10, threshold = 3.0)
      .collect().map { r =>
        r.getAs[Long]("event_id") -> ((r.getAs[Long]("n_ref"),
          Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue()),
          r.getAs[Boolean]("is_anomaly")))
      }.toMap

    assert(got.keySet == want.keySet)
    val diffs = got.keys.filter(k => got(k) != want(k)).toSeq.sorted
    assert(diffs.isEmpty, s"mismatch at $diffs: " +
      diffs.take(3).map(k => s"$k got=${got(k)} want=${want(k)}").mkString("; "))
    // and the planted outliers actually flag
    assert(got(48L)._3 && got(55L)._3)
  }

  test("state is bounded at lookback entries per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamingAnomaly.Event]
    val q = StreamingAnomaly.rollingZScore(mem.toDS(), lookback = 5,
        minN = 2).writeStream.format("memory")
      .queryName("anomaly_bound_out").outputMode("append").start()
    mem.addData((0L until 50L).map(i => ev(i, 1L, i.toDouble)): _*)
    q.processAllAvailable()
    // 50 events through a lookback-5 window: the 50th row's reference
    // count must be capped at 5 — state did not grow with the stream
    mem.addData(ev(50L, 1L, 0.0)); q.processAllAvailable()
    q.stop()
    val last = s.table("anomaly_bound_out").collect()
      .find(_.getAs[Long]("event_id") == 50L).get
    assert(last.getAs[Long]("n_ref") == 5L)
  }
}
