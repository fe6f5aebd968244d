package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 22: X268 decay aggregates, X269 multi-touch attribution.
  */
class Wave22Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("decayAggregate: an event one half-life old counts exactly " +
    "half; value sums decay the same way") {
    val s = spark
    import s.implicits._
    val df = Seq(("A", ts(8), 10.0), ("A", ts(1), 20.0),
      ("B", ts(8), 4.0)).toDF("k", "ts", "v")
    val r = TimeSeries.decayAggregate(df, "k", "ts", "v",
        halfLifeDays = 7.0)
      .collect().map(x => x.getAs[String]("k") -> x).toMap
    // horizon = day 8; A: age 0 (w 1) + age 7 (w .5)
    assert(r("A").getAs[Double]("decayed_count") == 1.5)
    assert(r("A").getAs[Double]("decayed_value_sum") == 20.0) // 10+10
    assert(r("B").getAs[Double]("decayed_count") == 1.0)
    assert(r("A").getAs[Long]("n_events") == 2L)
  }

  test("attribution: hand journeys — first/last/linear split, " +
    "out-of-window touches fall to (none), credit conserves") {
    val s = spark
    import s.implicits._
    val touches = Seq(
      (1L, ts(10), "view"), (1L, ts(12), "click"),
      (2L, ts(1), "view"), // 29 days before u2's purchase: outside
      (3L, ts(20), "view")).toDF("user", "ts", "ch")
    val convs = Seq((1L, ts(14), 101L), (2L, ts(30), 102L),
      (3L, ts(21), 103L)).toDF("user", "ts", "cid")
    val r = Funnel.attribution(touches, convs, "user", "ts", "ch",
        "cid", lookbackDays = 7)
      .collect().map(x => x.getAs[String]("channel") -> x).toMap
    // u1: view first, click last, linear .5/.5; u3: view both
    assert(r("view").getAs[Long]("first_touch") == 2L)
    assert(r("view").getAs[Long]("last_touch") == 1L)
    assert(r("click").getAs[Long]("first_touch") == 0L)
    assert(r("click").getAs[Long]("last_touch") == 1L)
    assert(r("view").getAs[Double]("linear_credit") == 1.5)
    assert(r("click").getAs[Double]("linear_credit") == 0.5)
    // u2's purchase had only an out-of-window touch -> (none)
    assert(r("(none)").getAs[Long]("first_touch") == 1L)
    assert(r("(none)").getAs[Double]("linear_credit") == 1.0)
    // conservation: every credit flavor sums to the conversion count
    Seq("first_touch", "last_touch").foreach { c =>
      assert(r.values.map(_.getAs[Long](c)).sum == 3L, c)
    }
    assert(r.values.map(_.getAs[Double]("linear_credit")).sum == 3.0)
  }
}
