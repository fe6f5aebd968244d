package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 32: X304 pairwise contrasts, X305 seasonal
  * decomposition, X306 Benjamini-Yekutieli, X307 Mood's median test.
  */
class Wave32Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("pairwiseContrasts: two-group hand case t = -2.828427 with " +
    "pooled se sqrt(2); pair order is canonical; k groups emit " +
    "k(k-1)/2 rows") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "v")
    val r = Hypothesis.pairwiseContrasts(df, "g", "v").head()
    assert(r.getAs[String]("group_a") == "a")
    assert(r.getAs[Double]("mean_diff") == -4.0)
    assert(r.getAs[Double]("se") == 1.414214)
    assert(r.getAs[Double]("t_stat") == -2.828427)
    val three = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0), ("b", 5.0),
      ("c", 9.0), ("c", 8.0)).toDF("g", "v")
    assert(Hypothesis.pairwiseContrasts(three, "g", "v").count() == 3L)
  }

  test("seasonalDecompose: a clean period-3 sawtooth recovers " +
    "effects (-10, 0, +10) exactly; warmup rows without a full MA " +
    "window drop") {
    val s = spark
    import s.implicits._
    val vs = Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 20L, 30L)
    val df = vs.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("o", "v")
    val r = TimeSeries.seasonalDecompose(df, "o", "v", period = 3)
      .orderBy("phase").collect()
    assert(r.length == 3)
    assert(r.map(_.getAs[Double]("seasonal")).toSeq ==
      Seq(-10.0, 0.0, 10.0))
    assert(r.map(_.getAs[Double]("raw_effect")).toSeq ==
      Seq(-10.0, 0.0, 10.0))
    // 9 rows, 2 warmup rows dropped at each end: 7 detrended obs
    assert(r.map(_.getAs[Long]("n_obs")).sum == 7L)
  }

  test("byAdjust: harmonic inflation makes BY never more permissive " +
    "than BH — the hand ladder [0.01, 0.02, 0.3] adjusts to " +
    "[0.055, 0.055, 0.55] and rejects nothing at 0.05") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.3)).toDF("k", "p")
    val r = Hypothesis.byAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank").collect()
    assert(math.abs(r.head.getAs[Double]("h_m") - 1.833333) < 1e-6)
    assert(r.map(_.getAs[Double]("p_adj")).toSeq ==
      Seq(0.055, 0.055, 0.55))
    assert(r.forall(!_.getAs[Boolean]("reject")))
    val bh = Hypothesis.bhAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank").collect().map(_.getAs[Double]("p_adj"))
    r.map(_.getAs[Double]("p_adj")).zip(bh).foreach { case (by, b) =>
      assert(by >= b - 1e-9, s"BY $by more permissive than BH $b")
    }
  }

  test("moodMedianTest: separated groups score chi2 = 6 around the " +
    "exact global median 3; identical groups score 0") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0)).toDF("g", "v")
    val r = Hypothesis.moodMedianTest(df, "g", "v").head()
    assert(r.getAs[Double]("median") == 3.0)
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("chi2") == 6.0)
    val same = Seq(("a", 1.0), ("a", 9.0), ("b", 1.0), ("b", 9.0))
      .toDF("g", "v")
    assert(Hypothesis.moodMedianTest(same, "g", "v").head()
      .getAs[Double]("chi2") == 0.0)
  }
}
