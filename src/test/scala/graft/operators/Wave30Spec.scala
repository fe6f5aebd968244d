package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 30: X296 Wilcoxon signed-rank, X297 Bartlett, X298
  * Grubbs, X299 runs test.
  */
class Wave30Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("wilcoxonSignedRank: untied hand case z = 0.365148; midrank " +
    "ties W+ = 4.5, z = 0.816497; zero diffs drop and are counted") {
    val s = spark
    import s.implicits._
    val a = Seq(1.0, 2.0, 3.0, -4.0, 0.0).toDF("d")
    val r = Hypothesis.wilcoxonSignedRank(a, col("d")).head()
    assert(r.getAs[Long]("n_nonzero") == 4L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("w_plus") == 6.0)
    assert(r.getAs[Double]("z_stat") == 0.365148)
    val t = Hypothesis.wilcoxonSignedRank(
      Seq(1.0, -1.0, 2.0).toDF("d"), col("d")).head()
    assert(t.getAs[Double]("w_plus") == 4.5)
    assert(t.getAs[Double]("z_stat") == 0.816497)
    // all zeros: no nonzero pairs, NULL z
    val z = Hypothesis.wilcoxonSignedRank(
      Seq(0.0, 0.0).toDF("d"), col("d")).head()
    assert(z.getAs[Long]("n_nonzero") == 0L)
    assert(z.isNullAt(z.fieldIndex("z_stat")))
  }

  test("bartlett: equal variances score exactly 0; a 100x variance " +
    "gap scores 5.182042; any degenerate group nulls the statistic") {
    val s = spark
    import s.implicits._
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0))
      .toDF("g", "v")
    assert(Hypothesis.bartlett(eq, "g", "v").head()
      .getAs[Double]("t_stat") == 0.0)
    val gap = Seq(("a", 1.0), ("a", 3.0), ("a", 5.0),
      ("b", 10.0), ("b", 30.0), ("b", 50.0)).toDF("g", "v")
    val r = Hypothesis.bartlett(gap, "g", "v").head()
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("t_stat") == 5.182042)
    val degen = Seq(("a", 1.0), ("a", 2.0), ("b", 7.0)).toDF("g", "v")
    val d = Hypothesis.bartlett(degen, "g", "v").head()
    assert(d.isNullAt(d.fieldIndex("t_stat")))
  }

  test("grubbs: [1,2,3,100] names 100 with G = 1.499792; deviation " +
    "ties break to the smaller value; constant column NULL") {
    val s = spark
    import s.implicits._
    val r = Hypothesis.grubbs(Seq(1.0, 2.0, 3.0, 100.0).toDF("v"),
      "v").head()
    assert(r.getAs[Double]("mean") == 26.5)
    assert(r.getAs[Double]("sd") == 49.006802)
    assert(r.getAs[Double]("g_stat") == 1.499792)
    assert(r.getAs[Double]("outlier_value") == 100.0)
    // symmetric pair ties on deviation: the smaller value reports
    val sym = Seq(0.0, 10.0, 5.0).toDF("v")
    assert(Hypothesis.grubbs(sym, "v").head()
      .getAs[Double]("outlier_value") == 0.0)
    val const = Seq(4.0, 4.0, 4.0).toDF("v")
    val c = Hypothesis.grubbs(const, "v").head()
    assert(c.isNullAt(c.fieldIndex("g_stat")))
  }

  test("runsTest: T T F F T has 3 runs, z = -0.436436; a one-sided " +
    "sequence reports NULL; alternation inflates runs above the mean") {
    val s = spark
    import s.implicits._
    val df = Seq((1, true), (2, true), (3, false), (4, false),
      (5, true)).toDF("o", "b")
    val r = TimeSeries.runsTest(df, "o", col("b")).head()
    assert(r.getAs[Long]("runs") == 3L)
    assert(r.getAs[Long]("n_true") == 3L)
    assert(r.getAs[Double]("z_stat") == -0.436436)
    val one = Seq((1, true), (2, true)).toDF("o", "b")
    val o = TimeSeries.runsTest(one, "o", col("b")).head()
    assert(o.isNullAt(o.fieldIndex("z_stat")))
    val alt = (1 to 10).map(i => (i, i % 2 == 0)).toDF("o", "b")
    val a = TimeSeries.runsTest(alt, "o", col("b")).head()
    assert(a.getAs[Long]("runs") == 10L)
    assert(a.getAs[Double]("z_stat") > 2.0)
  }
}
