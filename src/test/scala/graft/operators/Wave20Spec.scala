package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 20: X261 PR curve + AP, X262 cost threshold, X263
  * classification report, X264 Nelson-Aalen.
  */
class Wave20Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("prCurve: hand 3-step curve — precision dips on the false " +
    "positive, running AP integrates the recall steps") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("s", "y")
    val r = RankEval.prCurve(df, "s", col("y"))
      .orderBy(col("threshold").desc).collect()
    assert(r.map(_.getAs[Double]("precision")).toSeq ==
      Seq(1.0, 0.5, 0.666667))
    assert(r.map(_.getAs[Double]("recall")).toSeq ==
      Seq(0.5, 0.5, 1.0))
    assert(r.map(_.getAs[Double]("avg_precision_running")).toSeq ==
      Seq(0.5, 0.5, 0.833333)) // .5*1 + 0 + .5*(2/3)
  }

  test("costThreshold: the argmin cut is flagged, ties break toward " +
    "the higher threshold (accept less)") {
    val s = spark
    import s.implicits._
    // scores 3(pos),2(neg),1(pos); cFP=1, cFN=1:
    // t=3: fp0 fn1 cost1; t=2: fp1 fn1 cost2; t=1: fp1 fn0 cost1
    // -> tie between t=3 and t=1, optimal flag goes to t=3
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("s", "y")
    val r = RankEval.costThreshold(df, "s", col("y"), 1.0, 1.0)
      .orderBy(col("threshold").desc).collect()
    assert(r.map(_.getAs[Double]("expected_cost")).toSeq ==
      Seq(1.0, 2.0, 1.0))
    assert(r.map(_.getAs[Boolean]("is_optimal")).toSeq ==
      Seq(true, false, false))
    // asymmetric costs move the optimum: cFN=10 -> accept everything
    val r2 = RankEval.costThreshold(df, "s", col("y"), 1.0, 10.0)
      .orderBy(col("threshold").desc).collect()
    assert(r2.map(_.getAs[Boolean]("is_optimal")).toSeq ==
      Seq(false, false, true))
  }

  test("classificationReport: hand confusion — per-class P/R/F1, " +
    "macro and micro agree by hand, prediction-only classes kept") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("act", "prd")
    val r = RankEval.classificationReport(df, col("act"), col("prd"))
      .collect().map(x => x.getAs[String]("label") -> x).toMap
    assert(r("a").getAs[Long]("tp") == 1L)
    assert(r("a").getAs[Double]("precision") == 1.0)
    assert(r("a").getAs[Double]("recall") == 0.5)
    assert(r("a").getAs[Double]("f1") == 0.666667)
    assert(r("b").getAs[Double]("precision") == 0.5)
    assert(r("b").getAs[Double]("recall") == 1.0)
    assert(r("a").getAs[Double]("macro_f1") == 0.666667)
    assert(r("a").getAs[Double]("micro_f1") == 0.666667) // 2/3
    // a class that only appears in predictions still gets a row
    val ghost = Seq(("a", "a"), ("a", "c")).toDF("act", "prd")
    val g = RankEval.classificationReport(ghost, col("act"),
      col("prd")).collect().map(x => x.getAs[String]("label") -> x)
      .toMap
    assert(g.contains("c"))
    assert(g("c").isNullAt(g("c").fieldIndex("recall")))
  }

  test("nelsonAalen: textbook 1,2+,3,4+,5 ladder — additive hazard " +
    "steps with censoring-correct risk sets") {
    val s = spark
    import s.implicits._
    val subj = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true)).toDF("dur", "ev")
    val r = Funnel.nelsonAalen(subj, "dur", col("ev"))
      .orderBy("duration").collect()
    assert(r.map(_.getAs[Long]("duration")).toSeq == Seq(1L, 3L, 5L))
    assert(r.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(5L, 3L, 1L))
    assert(r.map(_.getAs[Double]("cumulative_hazard")).toSeq ==
      Seq(0.2, 0.533333, 1.533333)) // 1/5, +1/3, +1/1
  }
}
