package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 26: X280 ACF/Ljung-Box, X281 Durbin-Watson, X282
  * Cramér-von Mises, X283 Jarque-Bera.
  */
class Wave26Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("acfLjungBox: hand series 1..5 — r1=0.4, r2=-0.1, cumulative " +
    "LB 1.4 then ~1.516667; constant series reports NULL") {
    val s = spark
    import s.implicits._
    val df = (1 to 5).map(i => (i, i.toLong)).toDF("o", "v")
    val r = TimeSeries.acfLjungBox(df, "o", "v", maxLag = 2)
      .orderBy("lag").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Double]("acf") == 0.4)
    assert(r(1).getAs[Double]("acf") == -0.1)
    assert(r(0).getAs[Double]("lb_q") == 1.4)
    assert(math.abs(r(1).getAs[Double]("lb_q") - 1.516667) < 1e-6)
    assert(r.forall(_.getAs[Long]("n") == 5L))
    val const = (1 to 6).map(i => (i, 7L)).toDF("o", "v")
    val c = TimeSeries.acfLjungBox(const, "o", "v", maxLag = 2)
      .collect()
    assert(c.forall(_.isNullAt(c.head.fieldIndex("acf"))))
  }

  test("durbinWatson: alternating residuals push DW above 2 (hand " +
    "golden 3.729437); a perfect trend has zero residual variance " +
    "-> NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 3L, 2L, 5L, 4L, 6L).zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("o", "v")
    val r = TimeSeries.durbinWatson(df, "o", "v").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("slope") == 0.885714)
    assert(r.getAs[Double]("dw") == 3.729437)
    assert(r.getAs[Double]("rho1") == -0.864719)
    val perfect = (1 to 5).map(i => (i, 10L + 3L * i)).toDF("o", "v")
    val p = TimeSeries.durbinWatson(perfect, "o", "v").head()
    assert(p.isNullAt(p.fieldIndex("dw")))
    assert(p.getAs[Double]("slope") == 3.0)
  }

  test("cramerVonMises: identical distributions score exactly 0; " +
    "disjoint singletons score 0.25; value shift is symmetric") {
    val s = spark
    import s.implicits._
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    val r0 = Hypothesis.cramerVonMises(same, "v", col("a")).head()
    assert(r0.getAs[Double]("cvm_t") == 0.0)
    assert(r0.getAs[Long]("n_a") == 2L)
    val disj = Seq((1.0, true), (2.0, false)).toDF("v", "a")
    assert(Hypothesis.cramerVonMises(disj, "v", col("a")).head()
      .getAs[Double]("cvm_t") == 0.25)
    // symmetry: swapping the groups preserves T
    val mix = Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false))
      .toDF("v", "a")
    val t1 = Hypothesis.cramerVonMises(mix, "v", col("a")).head()
      .getAs[Double]("cvm_t")
    val t2 = Hypothesis.cramerVonMises(mix, "v", !col("a")).head()
      .getAs[Double]("cvm_t")
    assert(t1 == t2 && t1 > 0.0)
  }

  test("jarqueBera: symmetric 1..5 — skew 0, excess kurtosis -1.3, " +
    "JB 0.352083; a fractional score column survives via unit=1e6; " +
    "zero variance reports NULL") {
    val s = spark
    import s.implicits._
    val r = Hypothesis.jarqueBera((1 to 5).map(_.toDouble).toDF("v"),
      "v").head()
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("ex_kurtosis") == -1.3)
    assert(r.getAs[Double]("jb_stat") == 0.352083)
    // [0,1] scores: unit=1 would collapse to integers; unit=1e6 keeps
    // the shape (skewed sample -> nonzero skewness)
    val frac = Seq(0.1, 0.1, 0.1, 0.2, 0.9).toDF("v")
    val f = Hypothesis.jarqueBera(frac, "v", unit = 1e6).head()
    assert(f.getAs[Double]("skewness") > 1.0)
    val z = Hypothesis.jarqueBera(Seq(5.0, 5.0, 5.0).toDF("v"), "v")
      .head()
    assert(z.isNullAt(z.fieldIndex("jb_stat")))
  }
}
