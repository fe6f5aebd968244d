package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Funnel ordering and conversion-window semantics on literal data. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def events = {
    val s = spark
    import s.implicits._
    Seq(
      // user 1: view → click → buy, all in order and in window
      (1L, ts(100), "view"), (1L, ts(200), "click"), (1L, ts(300), "buy"),
      // user 2: click BEFORE the first view — click must not count
      (2L, ts(100), "click"), (2L, ts(200), "view"),
      // user 3: view, then click far outside the window
      (3L, ts(100), "view"), (3L, ts(10000), "click"),
      // user 4: never views; their click can't enter the funnel
      (4L, ts(50), "click"), (4L, ts(60), "buy"))
      .toDF("user_id", "ts", "event_type")
  }

  private val steps = Seq(
    ("view", col("event_type") === "view"),
    ("click", col("event_type") === "click"),
    ("buy", col("event_type") === "buy"))

  test("ordering: steps only count at-or-after the previous step") {
    val got = Funnel.counts(events, "user_id", "ts", steps)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((3L, 2L, 1L)))
    // 3 viewers (1,2,3); clickers after view: 1 and 3; buyer: 1
  }

  test("conversion window drops timed-out steps") {
    val got = Funnel.counts(events, "user_id", "ts", steps,
        maxGapMicros = Some(500L * 1000000)) // 500 s
      .collect()(0)
    // user 3's click at +9900 s now times out
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((3L, 1L, 1L)))
  }

  test("stepTimes: drop-out users keep nulls, not rows from others") {
    val s = spark
    import s.implicits._
    val t = Funnel.stepTimes(events, "user_id", "ts", steps)
      .orderBy($"user_id").collect()
    assert(t.length == 3) // users 1,2,3 reached step 1
    val u2 = t.find(_.getLong(0) == 2L).get
    assert(!u2.isNullAt(1) && u2.isNullAt(2) && u2.isNullAt(3))
  }
}
