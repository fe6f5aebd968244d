package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 21: X265 Cronbach's alpha, X266 one-way ANOVA, X267
  * Kruskal-Wallis.
  */
class Wave21Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("cronbachAlpha: duplicated item scores 1, independent " +
    "orthogonal items score 0, constant composite is NULL") {
    val s = spark
    import s.implicits._
    val dup = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (5.0, 5.0))
      .toDF("a", "b")
    val r = Hypothesis.cronbachAlpha(dup,
      Seq(dup("a"), dup("b"))).head()
    assert(r.getAs[Double]("alpha") == 1.0)
    assert(r.getAs[Long]("n_items") == 2L)
    val ind = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
      .toDF("a", "b")
    assert(Hypothesis.cronbachAlpha(ind, Seq(ind("a"), ind("b")))
      .head().getAs[Double]("alpha") == 0.0)
    // x and -x: the composite is constant -> total var 0 -> NULL
    val anti = Seq((1.0, -1.0), (2.0, -2.0), (3.0, -3.0))
      .toDF("a", "b")
    val ra = Hypothesis.cronbachAlpha(anti, Seq(anti("a"), anti("b")))
      .head()
    assert(ra.isNullAt(ra.fieldIndex("alpha")))
  }

  test("oneWayAnova: hand two-group case — F = 13.5, eta^2 = 27/35; " +
    "zero within-group variance voids F") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Hypothesis.oneWayAnova(df, "g", "v").head()
    assert(r.getAs[Long]("df_between") == 1L)
    assert(r.getAs[Long]("df_within") == 4L)
    assert(r.getAs[Double]("f_stat") == 13.5)
    assert(r.getAs[Double]("eta_sq") == 0.771429)
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val rf = Hypothesis.oneWayAnova(flat, "g", "v").head()
    assert(rf.isNullAt(rf.fieldIndex("f_stat")))
    assert(rf.getAs[Double]("eta_sq") == 1.0)
  }

  test("kruskalWallis: hand no-tie case gives H = 2.4 exactly; " +
    "all-tied values report NULL via the tie correction") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Hypothesis.kruskalWallis(df, "g", "v").head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 4L)
    assert(r.getAs[Double]("h_stat") == 2.4)
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val rf = Hypothesis.kruskalWallis(flat, "g", "v").head()
    assert(rf.isNullAt(rf.fieldIndex("h_stat")))
  }
}
