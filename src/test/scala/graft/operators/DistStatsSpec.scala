package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 1: X184 Gini/top-p, X185 Benford, X186 Otsu, X187
  * Good-Turing.
  */
class DistStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("giniConcentration: equal weights give 0; hand-computed " +
    "skewed case; exact top-90% item count") {
    val s = spark
    import s.implicits._
    val eq = DistStats.giniConcentration(
      Seq.fill(4)(5L).toDF("w"), "w").head()
    assert(eq.getAs[Double]("gini") == 0.0)
    // target = ceil(0.9*20) = 18 -> 4 items of weight 5 needed
    assert(eq.getAs[Long]("top_p_items") == 4L)
    // weights [1,1,3,5]: G = (-3*1 -1*1 +1*3 +3*5) / (4*10) = 0.35;
    // top-90 target = 9 -> 5 + 3 + one 1 = 3 items
    val r = DistStats.giniConcentration(
      Seq(1L, 1L, 3L, 5L).toDF("w"), "w").head()
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("total_weight") == 10L)
    assert(r.getAs[Double]("gini") == 0.35)
    assert(r.getAs[Long]("top_p_items") == 3L)
  }

  test("benford: digit parsing via cents, expected log-law masses, " +
    "zero/negative values excluded") {
    val s = spark
    import s.implicits._
    // 0.05 -> 5 cents -> digit 5; 123.45 -> 12345 -> 1; 9.0 -> 900
    // -> 9; 0 and negatives drop
    val df = Seq(0.05, 123.45, 9.0, 0.0, -3.2).toDF("v")
    val rows = DistStats.benford(df, "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("observed"), r.getAs[Double]("expected"))).toMap
    assert(rows.keySet == Set(1, 5, 9))
    assert(rows(1)._1 == 1L && rows(5)._1 == 1L && rows(9)._1 == 1L)
    // expected mass for digit 1 over n=3: 3*log10(2) = 0.90309
    assert(math.abs(rows(1)._2 - 3 * math.log10(2)) < 1e-6)
    assert(math.abs(rows(9)._2 - 3 * (math.log(1 + 1.0 / 9) /
      math.log(10))) < 1e-6)
  }

  test("otsuThreshold: bimodal split lands between the modes with " +
    "the exact between-class variance; fractional scores work") {
    val s = spark
    import s.implicits._
    val r = DistStats.otsuThreshold(
      Seq(1L, 1L, 1L, 10L, 10L, 10L).toDF("v"), "v").head()
    // split at 1: sigma_b = (3*3*(10-1)^2)/36 = 20.25
    assert(r.getAs[Double]("threshold") == 1.0)
    assert(r.getAs[Double]("sigma_b") == 20.25)
    assert(r.getAs[Long]("n_below") == 3L)
    assert(r.getAs[Long]("n_above") == 3L)
    val f = DistStats.otsuThreshold(
      Seq(0.1, 0.1, 0.9, 0.9).toDF("v"), "v").head()
    // sigma_b = (2*2*0.8^2)/16 = 0.16
    assert(f.getAs[Double]("threshold") == 0.1)
    assert(f.getAs[Double]("sigma_b") == 0.16)
  }

  test("goodTuring: hand-computed r* ladder and Turing unseen mass; " +
    "missing N_{r+1} gives NULL r_star") {
    val s = spark
    import s.implicits._
    // 3 hapaxes, 2 doubletons, 1 tripleton: T = 10
    val counts = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("c")
    val rows = DistStats.goodTuring(counts, "c", maxR = 10)
      .orderBy("r").collect()
    assert(rows.length == 4) // r = 0,1,2,3
    val r0 = rows(0)
    assert(r0.getAs[Long]("r") == 0L && r0.getAs[Double]("p_gt") == 0.3)
    val r1 = rows(1)
    // r* = 2*N2/N1 = 4/3; p = (4/3)/10
    assert(math.abs(r1.getAs[Double]("r_star") - 4.0 / 3) < 1e-6)
    assert(math.abs(r1.getAs[Double]("p_gt") - 0.133333) < 1e-6)
    val r2 = rows(2)
    assert(r2.getAs[Double]("r_star") == 1.5)
    val r3 = rows(3)
    assert(r3.isNullAt(r3.fieldIndex("r_star")))
  }
}
