package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 41: X335 Hodges-Lehmann shift, X336 sign test. */
class Wave41Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("hodgesLehmannShift: a clean +10 shift is recovered exactly; " +
    "one wild outlier cannot move it (the mean difference moves)") {
    val s = spark
    import s.implicits._
    val shifted = ((1 to 9).map(i => (i + 10.0, true)) ++
      (1 to 9).map(i => (i.toDouble, false))).toDF("v", "a")
    val r = Hypothesis.hodgesLehmannShift(shifted, "v", col("a"))
      .head()
    assert(r.getAs[Long]("n_cross_pairs") == 81L)
    assert(r.getAs[Double]("hl_shift") == 10.0)
    // poison one A value: HL unmoved, mean diff jumps ~111
    val poisoned = ((1 to 8).map(i => (i + 10.0, true)) :+
      ((1000.0, true))) ++ (1 to 9).map(i => (i.toDouble, false))
    val p = Hypothesis.hodgesLehmannShift(poisoned.toDF("v", "a"),
      "v", col("a")).head()
    assert(p.getAs[Double]("hl_shift") == 10.0)
  }

  test("signTest: counts are exact, ties drop, z follows the sign " +
    "imbalance; all-tie input is NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0, 3.0, -4.0, 0.0, 5.0, 6.0, 7.0, 8.0, -9.0)
      .toDF("d")
    val r = Hypothesis.signTest(df, col("d")).head()
    assert(r.getAs[Long]("n_pos") == 7L)
    assert(r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("z_stat") == 1.666667)
    val tied = Seq(0.0, 0.0).toDF("d")
    val t = Hypothesis.signTest(tied, col("d")).head()
    assert(t.isNullAt(t.fieldIndex("z_stat")))
  }
}
