package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 27: X284 Levene, X285 Friedman, X286 Cochran's Q,
  * X287 ICC(1).
  */
class Wave27Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("levene: hand two-group fixture W = 0.8; equal spreads score " +
    "near zero; single group is NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val r = Hypothesis.levene(df, "g", "v").head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("df_within") == 4L)
    assert(r.getAs[Double]("w_stat") == 0.8)
    // identical spreads: |deviations| identical across groups -> W = 0
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0))
      .toDF("g", "v")
    assert(Hypothesis.levene(eq, "g", "v").head()
      .getAs[Double]("w_stat") == 0.0)
    val solo = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val sr = Hypothesis.levene(solo, "g", "v").head()
    assert(sr.isNullAt(sr.fieldIndex("w_stat")))
  }

  test("friedman: perfect consistent ranking (k=3, n=3) scores " +
    "chi2 = 6; incomplete blocks drop and are counted; all-tied " +
    "blocks are NULL") {
    val s = spark
    import s.implicits._
    val rows = (1 to 3).flatMap(b => Seq((s"b$b", "t1", 1.0),
      (s"b$b", "t2", 2.0), (s"b$b", "t3", 3.0))) :+
      (("b4", "t1", 9.0)) // incomplete block: dropped
    val r = Hypothesis.friedman(rows.toDF("b", "t", "v"), "b", "t",
      "v").head()
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_dropped_blocks") == 1L)
    assert(r.getAs[Long]("df") == 2L)
    assert(r.getAs[Double]("chi2") == 6.0)
    // every block fully tied: zero denominator -> NULL
    val tied = (1 to 2).flatMap(b => Seq((s"b$b", "t1", 5.0),
      (s"b$b", "t2", 5.0))).toDF("b", "t", "v")
    val tr = Hypothesis.friedman(tied, "b", "t", "v").head()
    assert(tr.isNullAt(tr.fieldIndex("chi2")))
  }

  test("cochranQ: hand 4-block fixture Q = 6.5; missing cells count " +
    "as failures (same Q when the zero rows are simply absent)") {
    val s = spark
    import s.implicits._
    val full = Seq(
      ("b1", "t1", true), ("b1", "t2", true), ("b1", "t3", false),
      ("b2", "t1", true), ("b2", "t2", true), ("b2", "t3", false),
      ("b3", "t1", true), ("b3", "t2", true), ("b3", "t3", false),
      ("b4", "t1", true), ("b4", "t2", false), ("b4", "t3", false))
      .toDF("b", "t", "x")
    val r = Hypothesis.cochranQ(full, "b", "t", col("x")).head()
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_successes") == 7L)
    assert(r.getAs[Double]("q_stat") == 6.5)
    // drop the false rows entirely — missing cells are failures, but
    // t3 must still be observed somewhere to stay in the design
    val sparse = Seq(
      ("b1", "t1", true), ("b1", "t2", true), ("b1", "t3", false),
      ("b2", "t1", true), ("b2", "t2", true),
      ("b3", "t1", true), ("b3", "t2", true),
      ("b4", "t1", true)).toDF("b", "t", "x")
    assert(Hypothesis.cochranQ(sparse, "b", "t", col("x")).head()
      .getAs[Double]("q_stat") == 6.5)
  }

  test("icc1: perfectly clustered groups -> icc 1 with k0 = 2; " +
    "identical groups -> icc -1; ms values are in value^2 units") {
    val s = spark
    import s.implicits._
    val clustered = Seq(("g1", 1.0), ("g1", 1.0), ("g2", 5.0),
      ("g2", 5.0)).toDF("g", "v")
    val r = Hypothesis.icc1(clustered, "g", "v").head()
    assert(r.getAs[Double]("k0") == 2.0)
    assert(r.getAs[Double]("ms_between") == 16.0)
    assert(r.getAs[Double]("ms_within") == 0.0)
    assert(r.getAs[Double]("icc") == 1.0)
    val anti = Seq(("g1", 1.0), ("g1", 5.0), ("g2", 1.0), ("g2", 5.0))
      .toDF("g", "v")
    val a = Hypothesis.icc1(anti, "g", "v").head()
    assert(a.getAs[Double]("ms_between") == 0.0)
    assert(a.getAs[Double]("ms_within") == 8.0)
    assert(a.getAs[Double]("icc") == -1.0)
  }
}
