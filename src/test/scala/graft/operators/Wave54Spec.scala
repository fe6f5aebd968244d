package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 54 (X403–X407): PACF, lag-1 Granger, ERR@k, Yule's K,
  * 3-hop harmonic centrality. (Yule and harmonic are inline queries
  * verified by their hash oracles; the operators get hand values.)
  */
class Wave54Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X403 pacf -------------------------------------------------------------

  test("pacf: lag-1 equals acf(1); an AR(1)-ish ramp cuts off after " +
    "lag 1") {
    // strongly lag-1-correlated series: alternating slow ramp
    val v = Seq(10, 12, 14, 15, 17, 19, 20, 22, 24, 25, 27, 29, 30,
      32, 34, 35, 37, 39, 40, 42, 44, 45, 47, 49, 50, 52, 54, 55,
      57, 59)
    val df = v.zipWithIndex.map { case (x, i) => (i, x.toLong) }
      .toDF("o", "v")
    val rows = TimeSeries.pacf(df, "o", "v", maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    val acf = TimeSeries.acfLjungBox(df, "o", "v", maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag") ->
        r.getAs[Double]("acf")).toMap
    assert(rows(1).getAs[Double]("pacf") == rows(1).getAs[Double]("acf"))
    assert(math.abs(rows(1).getAs[Double]("acf") - acf(1)) < 1e-9)
    // partials beyond lag 1 collapse relative to the raw ACF tail
    assert(math.abs(rows(2).getAs[Double]("pacf")) <
      math.abs(acf(2)))
    assert(math.abs(rows(4).getAs[Double]("pacf")) <
      math.abs(acf(4)))
  }

  test("pacf: constant series yields NULL acf and pacf") {
    val df = (1 to 20).map(i => (i, 5L)).toDF("o", "v")
    val rows = TimeSeries.pacf(df, "o", "v", maxLag = 3).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("pacf"))))
  }

  // ---- X404 grangerLag1 ------------------------------------------------------

  test("grangerLag1: x that IS lagged y drives F high; noise does " +
    "not") {
    // y = known sequence; x_t = y_{t+1} + small perturbation (x
    // leads y strongly but not perfectly, so RSS_u stays positive)
    val y = Seq(5, 9, 4, 8, 7, 3, 9, 6, 2, 8, 5, 9, 4, 7, 3, 8, 6,
      2, 9, 5, 7, 4, 8, 3, 6, 9, 2, 7, 5, 8)
    val lead = y.drop(1) :+ 6
    val df = y.indices.map(i =>
      (i, y(i).toLong, lead(i).toLong * 10 + (i % 3)))
      .toDF("o", "y", "x")
    val r = TimeSeries.grangerLag1(df, "o", "y", "x").collect()(0)
    assert(r.getAs[Double]("rss_u") < r.getAs[Double]("rss_r") / 50)
    assert(r.getAs[Double]("f_stat") > 100.0)
    // a constant x adds nothing: du = 0 -> NULL coefficients -> NULL F
    val dfc = y.indices.map(i => (i, y(i).toLong, 4L))
      .toDF("o", "y", "x")
    val rc = TimeSeries.grangerLag1(dfc, "o", "y", "x").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("f_stat")))
  }

  // ---- X405 errAtK -----------------------------------------------------------

  test("errAtK: hand list — exact dyadic cascade") {
    // ranks 1..3 with grades 4, 0, 1 (k=3, G=4, lcm=6, den=16^3*6)
    val df = Seq(("q", 1, 4), ("q", 2, 0), ("q", 3, 1))
      .toDF("qid", "rank", "grade")
    val r = RankEval.errAtK(df, "qid", "rank", "grade", k = 3)
      .collect()(0)
    // ERR = 15/16 + 0 + (1/3)(1/16)(1/16)(15/16 stopper...)
    //     = 15/16 + (1/16)*(1-15/16)*0 at rank2 + rank3: R3=1/16,
    //       prefix (1-15/16)(1-0) = 1/16 -> term 1/(3*256)
    // num = 15*16^2*6 + 0 + 1*(16-15)*(16-0)*... spelled by the op:
    //   n1=15: 15*1*16^2*6 = 23040
    //   n3=1: 1*(1)*(16)*1*2 = 32
    assert(r.getAs[Long]("err_num") == 23072)
    assert(r.getAs[Long]("err_den") == 16L * 16 * 16 * 6)
    val want = BigDecimal(23072.0 / (16 * 16 * 16 * 6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("err") == want)
  }

  test("errAtK: a perfect top hit dominates everything below; " +
    "missing ranks gain 0") {
    val top = Seq(("q", 1, 4)).toDF("qid", "rank", "grade")
    val r = RankEval.errAtK(top, "qid", "rank", "grade", k = 5)
      .collect()(0)
    assert(r.getAs[Long]("n_ranked") == 1)
    assert(r.getAs[Double]("err") == 0.9375) // 15/16
    // same gain at rank 5 is worth a fifth of that, undamped by gaps
    val low = Seq(("q", 5, 4)).toDF("qid", "rank", "grade")
    val r5 = RankEval.errAtK(low, "qid", "rank", "grade", k = 5)
      .collect()(0)
    assert(r5.getAs[Double]("err") == 0.1875) // 15/80
  }
}