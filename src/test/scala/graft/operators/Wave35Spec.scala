package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 35: X316 winsorized Welch t, X317 proportion effects,
  * X318 negative-binomial fit, X319 Hurst exponent.
  */
class Wave35Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("winsorizedWelchT: one wild outlier is clamped to the p90 " +
    "boundary — t collapses to exactly 0 where the plain Welch t " +
    "sees a difference") {
    val s = spark
    import s.implicits._
    val rows = ((1 to 9).map(i => (i.toDouble, true)) :+
      ((1000.0, true))) ++ (1 to 10).map(i => (i.toDouble, false))
    val df = rows.toDF("v", "a")
    val wt = Hypothesis.winsorizedWelchT(df, "v", col("a"),
      loQ = 0.1, hiQ = 0.9).head()
    // both groups clamp to [1..9, 9]: identical -> t exactly 0
    assert(wt.getAs[Double]("t_stat") == 0.0)
    assert(wt.getAs[Double]("wins_mean_a") ==
      wt.getAs[Double]("wins_mean_b"))
    val plain = Hypothesis.welchTTest(df, "v", col("a")).head()
    assert(plain.getAs[Double]("t_stat") > 0.3,
      "the plain t should have been fooled by the outlier")
  }

  test("proportionEffects: hand 2x2 (30/70 vs 10/90) — h=0.515778, " +
    "RR=3, OR=3.857143 with Woolf se; zero cells null the ratios") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(30)((true, true)) ++
      Seq.fill(70)((false, true)) ++
      Seq.fill(10)((true, false)) ++ Seq.fill(90)((false, false))
    val r = Hypothesis.proportionEffects(rows.toDF("succ", "a"),
      col("succ"), col("a")).head()
    assert(r.getAs[Double]("rate_a") == 0.3)
    assert(r.getAs[Double]("cohens_h") == 0.515778)
    assert(r.getAs[Double]("risk_ratio") == 3.0)
    assert(r.getAs[Double]("odds_ratio") == 3.857143)
    assert(r.getAs[Double]("log_odds_ratio") == 1.349927)
    assert(r.getAs[Double]("se_log_or") == 0.39841)
    val zc = (Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, false)))
      .toDF("succ", "a")
    val z = Hypothesis.proportionEffects(zc, col("succ"), col("a"))
      .head()
    assert(z.isNullAt(z.fieldIndex("odds_ratio")))
  }

  test("negBinomialFit: under-dispersed counts report NULL params " +
    "with the VMR shown; the overdispersed hand case fits r=0.4, " +
    "p=0.166667") {
    val s = spark
    import s.implicits._
    val under = Seq(1.0, 2.0, 3.0).toDF("v")
    val u = DistStats.negBinomialFit(under, "v").head()
    assert(u.getAs[Double]("vmr") == 0.5)
    assert(u.isNullAt(u.fieldIndex("nb_r")))
    val over = Seq(0.0, 0.0, 6.0).toDF("v")
    val o = DistStats.negBinomialFit(over, "v").head()
    assert(o.getAs[Double]("mean") == 2.0)
    assert(o.getAs[Double]("variance") == 12.0)
    assert(o.getAs[Double]("nb_r") == 0.4)
    assert(o.getAs[Double]("nb_p") == 0.166667)
  }

  test("hurstExponent: a pure trend is persistent (H near 1); a " +
    "pure alternation has scale-free R/S (H exactly 0)") {
    val s = spark
    import s.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("o", "v")
    val trend = TimeSeries.hurstExponent(
      series((1 to 64).map(_.toLong)), "o", "v",
      sizes = Seq(4, 8, 16)).collect()
    assert(trend.length == 3)
    assert(trend.head.getAs[Double]("hurst") > 0.9)
    val alt = TimeSeries.hurstExponent(
      series((1 to 64).map(i => (i % 2).toLong)), "o", "v",
      sizes = Seq(4, 8, 16)).collect()
    assert(alt.head.getAs[Double]("hurst") == 0.0)
    // R/S is exactly 1 at every size for the alternation
    assert(alt.forall(_.getAs[Double]("mean_rs") == 1.0))
  }
}
