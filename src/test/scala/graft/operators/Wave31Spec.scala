package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 31: X300 Dickey-Fuller, X301 changepoint, X302 EWMA,
  * X303 forecast backtest.
  */
class Wave31Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def series(vs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    vs.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("o", "v")
  }

  test("dickeyFuller: hand mean-reverting series rho = -1.676471, " +
    "t = -5.23988; a perfect line has zero Sxx variance -> NULL") {
    val r = TimeSeries.dickeyFuller(series(Seq(3L, 1L, 2L, 0L, 3L,
      1L)), "o", "v").head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("rho") == -1.676471)
    assert(r.getAs[Double]("df_t") == -5.23988)
    val c = TimeSeries.dickeyFuller(series(Seq(5L, 5L, 5L)), "o", "v")
      .head()
    assert(c.isNullAt(c.fieldIndex("rho")))
  }

  test("changepoint: [1,1,1,9,9] splits after the third period with " +
    "exact means 1 and 9; argmax ties break to the earliest period") {
    val r = TimeSeries.changepoint(series(Seq(1L, 1L, 1L, 9L, 9L)),
      "o", "v").head()
    assert(r.getAs[Int]("changepoint_at") == 3)
    assert(r.getAs[Long]("split_index") == 3L)
    assert(r.getAs[Double]("cusum_max") == 9.6)
    assert(r.getAs[Double]("mean_before") == 1.0)
    assert(r.getAs[Double]("mean_after") == 9.0)
    // symmetric series: t=1 and t=3 tie -> earliest wins
    val t = TimeSeries.changepoint(series(Seq(9L, 5L, 5L, 9L)), "o",
      "v").head()
    assert(t.getAs[Long]("split_index") == 1L)
  }

  test("ewma: constant series is its own level; truncated warmup " +
    "normalizes (first row = raw value); step into an 8-window " +
    "gives 8.031373") {
    val c = TimeSeries.ewma(series(Seq(7L, 7L, 7L)), "o", "v")
      .collect()
    assert(c.forall(_.getAs[Double]("ewma") == 7.0))
    val vs = Seq.fill(9)(0L) :+ 16L
    val r = TimeSeries.ewma(series(vs), "o", "v", lambda = 0.5,
        lookback = 8)
      .orderBy("o").collect()
    assert(r.head.getAs[Double]("ewma") == 0.0)
    assert(r.last.getAs[Double]("ewma") == 8.031373)
    val alt = TimeSeries.ewma(series(Seq(4L, 0L, 4L)), "o", "v")
      .orderBy("o").collect()
    assert(alt.head.getAs[Double]("ewma") == 4.0)
    assert(alt.last.getAs[Double]("ewma") == 2.857143)
  }

  test("forecastBacktest: alternating series — naive is always 10 " +
    "off (smape 2/3), season-2 naive is exact; short history drops") {
    val s = spark
    import s.implicits._
    val df = series(Seq(10L, 20L, 10L, 20L, 10L))
    val r = TimeSeries.forecastBacktest(df, "o", "v", season = 2)
      .collect().map(x => x.getAs[String]("method") -> x).toMap
    val nv = r("naive")
    assert(nv.getAs[Long]("n_forecasts") == 4L)
    assert(nv.getAs[Double]("mae") == 10.0)
    assert(nv.getAs[Double]("rmse") == 10.0)
    assert(nv.getAs[Double]("smape") == 0.666667)
    val sv = r("seasonal")
    assert(sv.getAs[Long]("n_forecasts") == 3L)
    assert(sv.getAs[Double]("mae") == 0.0)
    assert(sv.getAs[Double]("smape") == 0.0)
  }
}
