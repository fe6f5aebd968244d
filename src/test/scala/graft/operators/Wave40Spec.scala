package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 40: X332 reliability table, X333 Dunn's post-hoc,
  * X334 seasonal strength.
  */
class Wave40Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("reliabilityTable: a perfectly calibrated bin shows zero gap; " +
    "an over-confident bin shows a positive gap; p = 1 clamps into " +
    "the top bin") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(8)((0.25, false)) ++ Seq.fill(2)((0.25, true)) ++
      Seq.fill(2)((0.95, true)) ++ Seq.fill(2)((0.95, false)) ++
      Seq((1.0, true))
    val r = Calibrate.reliabilityTable(rows.toDF("p", "y"), "p", "y",
        bins = 10)
      .collect().map(x => x.getAs[Long]("bin") -> x).toMap
    // bin 2: stated 0.25, observed 0.2 -> gap +0.05
    assert(r(2L).getAs[Long]("n") == 10L)
    assert(r(2L).getAs[Double]("mean_confidence") == 0.25)
    assert(r(2L).getAs[Double]("accuracy") == 0.2)
    assert(r(2L).getAs[Double]("gap") == 0.05)
    // 0.95 and the clamped 1.0 share the top bin
    assert(r(9L).getAs[Long]("n") == 5L)
    assert(r(9L).getAs[Long]("n_positive") == 3L)
  }

  test("dunnTest: separated groups give symmetric +-z pairs; equal " +
    "groups give z = 0 with equal mean ranks") {
    val s = spark
    import s.implicits._
    val df = Seq(("lo", 1.0), ("lo", 2.0), ("lo", 3.0),
      ("hi", 10.0), ("hi", 11.0), ("hi", 12.0),
      ("mid", 5.0), ("mid", 6.0), ("mid", 7.0)).toDF("g", "v")
    val r = Hypothesis.dunnTest(df, "g", "v")
      .collect()
      .map(x => (x.getAs[String]("group_a"),
        x.getAs[String]("group_b")) -> x).toMap
    assert(r.size == 3)
    // untied ranks 1..9: lo mean 2, mid mean 6, hi mean 8
    assert(r(("hi", "lo")).getAs[Double]("mean_rank_a") == 8.0)
    assert(r(("hi", "lo")).getAs[Double]("mean_rank_b") == 2.0)
    assert(r(("hi", "lo")).getAs[Double]("z_stat") > 2.0)
    assert(r(("hi", "mid")).getAs[Double]("z_stat") > 0.0)
    val same = Seq(("a", 1.0), ("a", 9.0), ("b", 1.0), ("b", 9.0))
      .toDF("g", "v")
    val z = Hypothesis.dunnTest(same, "g", "v").head()
    assert(z.getAs[Double]("z_stat") == 0.0)
  }

  test("seasonalStrength: a clean sawtooth is fully explained by its " +
    "phase (strength 1); a flat series has zero detrended variance " +
    "-> NULL; noise on top lowers strength below 1") {
    val s = spark
    import s.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("o", "v")
    val saw = series(Seq.fill(5)(Seq(10L, 20L, 30L)).flatten)
    val r = TimeSeries.seasonalStrength(saw, "o", "v", period = 3)
      .head()
    assert(r.getAs[Double]("seasonal_strength") == 1.0)
    assert(r.getAs[Double]("var_remainder") == 0.0)
    val flat = series(Seq.fill(9)(7L))
    val f = TimeSeries.seasonalStrength(flat, "o", "v", period = 3)
      .head()
    assert(f.isNullAt(f.fieldIndex("seasonal_strength")))
    // same sawtooth with one corrupted value: strength drops but
    // stays high
    val noisy = series(Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 99L,
      30L, 10L, 20L, 30L, 10L, 20L, 30L))
    val n = TimeSeries.seasonalStrength(noisy, "o", "v", period = 3)
      .head().getAs[Double]("seasonal_strength")
    assert(n > 0.3 && n < 1.0)
  }
}
