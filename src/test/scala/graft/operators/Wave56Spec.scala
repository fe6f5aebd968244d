package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 56 (X411–X413): Chow break test, regression influence
  * (Cook's distance), Western Electric control-chart rules.
  */
class Wave56Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  private def key(i: Int) = f"t$i%03d"

  // ---- X411 chowTest ---------------------------------------------------------

  test("chowTest: a real slope break drives F high; a globally " +
    "near-linear series does not") {
    val break1 = (1 to 20).map(i => (key(i), 100L + (i % 2))) ++
      (21 to 40).map(i => (key(i), 100L + 10L * (i - 20) + (i % 2)))
    val dfB = break1.toDF("o", "v")
    val rB = TimeSeries.chowTest(dfB, "o", "v",
      col("o") > key(20)).collect()(0)
    assert(rB.getAs[Long]("n1") == 20 && rB.getAs[Long]("n2") == 20)
    assert(rB.getAs[Double]("f_stat") > 50.0)
    // same line everywhere (with a tiny alternation so RSS > 0)
    val line = (1 to 40).map(i => (key(i), 2L * i + (i % 2)))
    val rL = TimeSeries.chowTest(line.toDF("o", "v"), "o", "v",
      col("o") > key(20)).collect()(0)
    assert(rL.getAs[Double]("f_stat") < 5.0)
    assert(rB.getAs[Double]("f_stat") > 20 * rL.getAs[Double]("f_stat"))
  }

  // ---- X412 regressionInfluence ----------------------------------------------

  test("regressionInfluence: the one outlier day carries the largest " +
    "Cook's D and gets flagged; endpoints carry the most leverage") {
    val vals = (1 to 21).map(i =>
      (key(i), if (i == 11) 500L else 10L * i))
    val rows = TimeSeries.regressionInfluence(vals.toDF("o", "v"),
      "o", "v").collect()
    val byT = rows.map(r => r.getAs[Long]("t") -> r).toMap
    val maxCook = rows.maxBy(_.getAs[Double]("cooks_d"))
    assert(maxCook.getAs[Long]("t") == 11)
    assert(maxCook.getAs[Boolean]("influential"))
    // leverage is symmetric and largest at the ends
    assert(byT(1L).getAs[Double]("leverage") ==
      byT(21L).getAs[Double]("leverage"))
    assert(byT(1L).getAs[Double]("leverage") >
      byT(11L).getAs[Double]("leverage"))
    // fitted + residual reconstruct the value
    rows.foreach { r =>
      val back = r.getAs[Double]("fitted") + r.getAs[Double]("residual")
      assert(math.abs(back - r.getAs[Long]("value")) < 1e-4)
    }
  }

  // ---- X413 westernElectric --------------------------------------------------

  test("westernElectric: a lone spike trips rule 1 only; an 8-run " +
    "on one side trips rule 4") {
    val spike = (1 to 20).map(i =>
      (key(i), if (i % 2 == 0) 110L else 90L)) :+ (key(21), 200L)
    val rs = TimeSeries.westernElectric(spike.toDF("o", "v"),
      "o", "v").collect()
    val r1Rows = rs.filter(_.getAs[Boolean]("r1"))
    assert(r1Rows.length == 1 && r1Rows(0).getAs[Long]("value") == 200)
    assert(rs.forall(!_.getAs[Boolean]("r4")))
    val run8 = (1 to 12).map(i =>
      (key(i), if (i % 2 == 0) 110L else 90L)) ++
      (13 to 20).map(i => (key(i), 130L))
    val rr = TimeSeries.westernElectric(run8.toDF("o", "v"),
      "o", "v").collect()
    assert(rr.last.getAs[Boolean]("r4"))
    assert(rr.forall(!_.getAs[Boolean]("r1")))
  }
}