package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 57 (X414–X416): seasonal Mann-Kendall, additive
  * Holt-Winters, ABC analysis (the last is an inline query verified
  * by its hash oracle).
  */
class Wave57Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  private def key(i: Int) = f"t$i%03d"

  // ---- X414 seasonalMannKendall ----------------------------------------------

  test("seasonalMannKendall: a pure weekly cycle reads zero trend; " +
    "a ramp reads strongly positive") {
    val cycle = (1 to 28).map(i => (key(i), ((i - 1) % 7 + 1) * 10L))
    val rc = TimeSeries.seasonalMannKendall(cycle.toDF("o", "v"),
      "o", "v", (expr("CAST(substr(o, 2) AS INT)") - 1) % 7)
      .collect()(0)
    assert(rc.getAs[Long]("s_stat") == 0)
    assert(rc.getAs[Long]("n_seasons") == 7)
    val ramp = (1 to 28).map(i => (key(i), i.toLong))
    val rr = TimeSeries.seasonalMannKendall(ramp.toDF("o", "v"),
      "o", "v", (expr("CAST(substr(o, 2) AS INT)") - 1) % 7)
      .collect()(0)
    // each of the 7 strata has 4 strictly increasing points: S = 7*6
    assert(rr.getAs[Long]("s_stat") == 42)
    assert(rr.getAs[Double]("z") > 3.0)
  }

  // ---- X415 holtWintersAdditive ----------------------------------------------

  test("holtWintersAdditive: hand recursion at period 2 — rotating " +
    "seasonal register, floor-halved integer state") {
    val df = Seq((key(1), 10.0), (key(2), 20.0), (key(3), 14.0),
      (key(4), 24.0), (key(5), 18.0)).toDF("o", "v")
    val rows = TimeSeries.holtWintersAdditive(df, "o", "v", period = 2)
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    // seeds: l = 15, s = (-5, +5)
    assert(rows(key(1)).getAs[Double]("seasonal") == -5.0)
    assert(rows(key(2)).getAs[Double]("seasonal") == 5.0)
    assert(rows(key(1)).isNullAt(rows(key(1)).fieldIndex("level")))
    // t=3: f=10, l=17, b=1, s=-4
    assert(rows(key(3)).getAs[Double]("forecast") == 10.0)
    assert(rows(key(3)).getAs[Double]("level") == 17.0)
    assert(rows(key(3)).getAs[Double]("trend") == 1.0)
    assert(rows(key(3)).getAs[Double]("seasonal") == -4.0)
    // t=4: f=23, l=18.5, b=1.25, s=5.25
    assert(rows(key(4)).getAs[Double]("forecast") == 23.0)
    assert(rows(key(4)).getAs[Double]("level") == 18.5)
    assert(rows(key(4)).getAs[Double]("trend") == 1.25)
    assert(rows(key(4)).getAs[Double]("seasonal") == 5.25)
    // t=5: f=15.75, l=20.875, b=1.8125, s=-3.4375
    assert(rows(key(5)).getAs[Double]("forecast") == 15.75)
    assert(rows(key(5)).getAs[Double]("level") == 20.875)
    assert(rows(key(5)).getAs[Double]("trend") == 1.8125)
    assert(rows(key(5)).getAs[Double]("seasonal") == -3.4375)
  }

  test("holtWintersAdditive: a clean weekly cycle forecasts itself " +
    "once the register settles") {
    val vals = (1 to 35).map(i =>
      (key(i), 100.0 + Seq(0, 20, -10, 5, -15, 10, -10)((i - 1) % 7)))
    val rows = TimeSeries.holtWintersAdditive(vals.toDF("o", "v"),
      "o", "v", period = 7).collect()
    val tail = rows.drop(28) // final week
    tail.foreach { r =>
      assert(math.abs(r.getAs[Double]("forecast") -
        r.getAs[Double]("value")) < 2.0,
        s"${r.getAs[String]("bucket")}: forecast should track the cycle")
    }
  }

  test("holtWintersByKey: each key's rows equal the single-series " +
    "recursion on that key alone (incl. the short-series seed branch)") {
    val a = Seq((key(1), 10.0), (key(2), 20.0), (key(3), 14.0),
      (key(4), 24.0), (key(5), 18.0))
    val b = (1 to 20).map(i => (key(i), 50.0 + (if (i % 2 == 0) 7.0 else -7.0)))
    val short = Seq((key(1), 3.0)) // 1 row <= period: seed-only branch
    val grouped = Seq("a" -> a, "b" -> b, "s" -> short)
      .flatMap { case (k, rs) => rs.map { case (o, v) => (k, o, v) } }
      .toDF("g", "o", "v")
    val got = TimeSeries.holtWintersByKey(grouped, "g", "o", "v", period = 2)
      .collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getAs[String]("bucket"))
          .map(r => (1 to 6).map(i => Option(r.get(i))).toSeq).toSeq
      }
    Seq("a" -> a, "b" -> b, "s" -> short).foreach { case (k, rs) =>
      val solo = TimeSeries.holtWintersAdditive(rs.toDF("o", "v"), "o", "v",
          period = 2)
        .collect().sortBy(_.getAs[String]("bucket"))
        .map(r => (0 to 5).map(i => Option(r.get(i))).toSeq).toSeq
      assert(got(k) == solo, s"key $k diverges from the solo recursion")
    }
  }

  test("holtLinearByKey: each key's rows equal the single-series " +
    "recursion on that key alone (incl. the <2-row seed branch)") {
    val a = Seq((key(1), 10.0), (key(2), 20.0), (key(3), 14.0),
      (key(4), 24.0), (key(5), 18.0))
    val b = (1 to 20).map(i => (key(i), 50.0 + 3.0 * i +
      (if (i % 2 == 0) 7.0 else -7.0)))
    val short = Seq((key(1), 3.0)) // 1 row: seed-only branch
    val grouped = Seq("a" -> a, "b" -> b, "s" -> short)
      .flatMap { case (k, rs) => rs.map { case (o, v) => (k, o, v) } }
      .toDF("g", "o", "v")
    val got = TimeSeries.holtLinearByKey(grouped, "g", "o", "v")
      .collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getAs[String]("bucket"))
          .map(r => (1 to 5).map(i => Option(r.get(i))).toSeq).toSeq
      }
    Seq("a" -> a, "b" -> b, "s" -> short).foreach { case (k, rs) =>
      val solo = TimeSeries.holtLinear(rs.toDF("o", "v"), "o", "v")
        .collect().sortBy(_.getAs[String]("bucket"))
        .map(r => (0 to 4).map(i => Option(r.get(i))).toSeq).toSeq
      assert(got(k) == solo, s"key $k diverges from the solo recursion")
    }
  }
}