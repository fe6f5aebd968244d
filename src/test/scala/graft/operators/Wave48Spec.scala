package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 48 (X364–X366): IPW/SNIPS, regression discontinuity,
  * Simpson's-paradox detector.
  */
class Wave48Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X364 ipwEstimate -------------------------------------------------

  test("ipwEstimate recovers the true effect under a RANDOMIZED " +
    "50/50 policy (IPW == SNIPS == plain mean gap)") {
    // e = 0.5 everywhere: weights cancel; treated outcomes 10/12, control 4/6
    val rows = Seq((true, 10.0, 0.5), (true, 12.0, 0.5),
      (false, 4.0, 0.5), (false, 6.0, 0.5)).toDF("t", "y", "e")
    val r = Hypothesis.ipwEstimate(rows, col("t"), "y", "e")
      .collect()(0)
    assert(r.getAs[Double]("ate_ipw") == 6.0)
    assert(r.getAs[Double]("ate_snips") == 6.0)
  }

  test("ipwEstimate corrects a confounded assignment that the raw " +
    "gap gets wrong") {
    // high-y units treated with e=0.8, low-y with e=0.2; true effect 0
    val rows = Seq(
      (true, 10.0, 0.8), (true, 10.0, 0.8), (false, 10.0, 0.8),
      (true, 2.0, 0.2), (false, 2.0, 0.2), (false, 2.0, 0.2))
      .toDF("t", "y", "e")
    val r = Hypothesis.ipwEstimate(rows, col("t"), "y", "e")
      .collect()(0)
    // SNIPS: ty/tw = (2*10/.8 + 2/.2)/(2/.8+1/.2) = 35/7.5 ≈ 4.667
    //        cy/cw = (10/.2 + 2*2/.8)/(1/.2+2/.8) = 55/7.5 ≈ 7.333
    assert(math.abs(r.getAs[Double]("ate_snips") - (35.0 / 7.5 -
      55.0 / 7.5)) < 1e-5)
  }

  // ---- X365 regressionDiscontinuity --------------------------------------

  test("regressionDiscontinuity recovers an exact injected jump on " +
    "clean linear sides") {
    // y = 2x below 10; y = 2x + 50 at/above 10; bandwidth covers all
    val rows = (1 to 19).map { i =>
      val x = i.toDouble
      (x, if (x >= 10) 2 * x + 50 else 2 * x)
    }.toDF("x", "y")
    val r = Hypothesis.regressionDiscontinuity(rows, "x", "y",
      cutoff = 10.0, bandwidth = 9.0).collect()(0)
    assert(r.getAs[Double]("slope_left") == 2.0)
    assert(r.getAs[Double]("slope_right") == 2.0)
    assert(r.getAs[Double]("left_at_cutoff") == 20.0)
    assert(r.getAs[Double]("right_at_cutoff") == 70.0)
    assert(r.getAs[Double]("rd_jump") == 50.0)
  }

  test("regressionDiscontinuity: bandwidth excludes far points; a " +
    "degenerate side nulls its fit") {
    val rows = Seq((9.0, 1.0), (9.5, 1.0), (10.0, 5.0), (11.0, 6.0),
      (99.0, 999.0)).toDF("x", "y")
    val r = Hypothesis.regressionDiscontinuity(rows, "x", "y",
      cutoff = 10.0, bandwidth = 2.0).collect()(0)
    assert(r.getAs[Long]("n_left") == 2 && r.getAs[Long]("n_right") == 2)
    assert(r.getAs[Double]("slope_right") == 1.0)
    // left side: two equal y's -> slope 0, fine; still defined
    assert(r.getAs[Double]("slope_left") == 0.0)
  }

  // ---- X366 simpsonCheck --------------------------------------------------

  test("simpsonCheck flags the classic reversal: within-stratum " +
    "negative, pooled positive") {
    // stratum A at low x, high y-range; B at high x: within each,
    // y FALLS with x; pooled, y RISES with x
    val rows = Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 9.0), ("A", 3.0, 8.0),
      ("B", 11.0, 20.0), ("B", 12.0, 19.0), ("B", 13.0, 18.0))
      .toDF("s", "x", "y")
    val r = Hypothesis.simpsonCheck(rows, "s", "x", "y").collect()(0)
    assert(r.getAs[Long]("overall_sign") == 1L)
    assert(r.getAs[Long]("n_negative") == 2L)
    assert(r.getAs[Long]("n_reversed") == 2L)
    assert(r.getAs[Boolean]("simpson_flag"))
  }

  test("simpsonCheck stays quiet when strata agree with the pooled " +
    "sign") {
    val rows = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0),
      ("B", 5.0, 5.0), ("B", 6.0, 7.0)).toDF("s", "x", "y")
    val r = Hypothesis.simpsonCheck(rows, "s", "x", "y").collect()(0)
    assert(r.getAs[Long]("n_positive") == 2L &&
      r.getAs[Long]("n_reversed") == 0L)
    assert(!r.getAs[Boolean]("simpson_flag"))
  }
}
