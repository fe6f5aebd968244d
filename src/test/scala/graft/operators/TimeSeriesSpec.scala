package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Resample semantics on literal data: gap materialization, forward
  * fill, per-key grid bounds, last-observation pick.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("hourly resample: gaps filled, last value carried forward") {
    val s = spark
    import s.implicits._
    val events = Seq(
      // user 1: hours 0 (two events), 3 (one) — hours 1,2 are gaps
      (1L, ts(600), 10.0), (1L, ts(1800), 20.0), (1L, ts(3 * 3600), 30.0),
      // user 2: single hour
      (2L, ts(7200), 5.0))
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleFfill(events, "user_id", "ts", "value",
        "hour")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 20.0), // last of the two in-hour events (by ts)
      (1L, 3600L, 0L, 20.0), // gap: carried forward
      (1L, 7200L, 0L, 20.0), // gap: carried forward
      (1L, 10800L, 1L, 30.0),
      (2L, 7200L, 1L, 5.0))) // user 2's grid is its own [min,max]
  }
}
