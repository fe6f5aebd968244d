package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 1: X181 Spearman, X182 binned Kendall tau-b, X183 Borda
  * aggregation.
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("spearman: perfect monotone 1, reversed -1, hand-computed " +
    "tie case, constant column NULL") {
    val s = spark
    import s.implicits._
    def rho(rows: Seq[(Double, Double)]): Option[Double] = {
      val r = RankStats.spearman(rows.toDF("x", "y"), "x", "y").head()
      if (r.isNullAt(1)) None else Some(r.getAs[Double]("spearman_rho"))
    }
    assert(rho(Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0))).contains(1.0))
    assert(rho(Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0))).contains(-1.0))
    // x = [1,1,2] (avg-tie ranks 1.5,1.5,3), y = [1,2,3] ->
    // rho = 1.5 / sqrt(1.5 * 2) = 0.866025
    assert(rho(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)))
      .exists(v => math.abs(v - 0.866025) < 1e-6))
    assert(rho(Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0))).isEmpty)
    // fractional scores survive micro-quantization
    assert(rho(Seq((0.1, 0.9), (0.2, 0.8), (0.3, 0.7))).contains(-1.0))
  }

  test("kendallTauB: hand case with one discordant pair, and the " +
    "tie-corrected all-ties grid") {
    val s = spark
    import s.implicits._
    // x = 0..3, y = (0,2,1,3), bins=4 keeps values distinct:
    // 1 discordant of 6 pairs -> tau = 4/6, frac_c = 5/6
    val r = RankStats.kendallTauB(
      Seq((0.0, 0.0), (1.0, 2.0), (2.0, 1.0), (3.0, 3.0)).toDF("x", "y"),
      "x", "y", bins = 4).head()
    assert(math.abs(r.getAs[Double]("frac_concordant") - 5.0 / 6) < 1e-6)
    assert(math.abs(r.getAs[Double]("frac_discordant") - 1.0 / 6) < 1e-6)
    assert(math.abs(r.getAs[Double]("tau_b") - 4.0 / 6) < 1e-6)
    // 2x2 checkerboard: C = D = 1, tie terms n1 = n2 = 2 ->
    // tau_b = 0 / sqrt((6-2)(6-2)) = 0
    val r2 = RankStats.kendallTauB(
      Seq((0.0, 0.0), (0.0, 3.0), (3.0, 0.0), (3.0, 3.0)).toDF("x", "y"),
      "x", "y", bins = 4).head()
    assert(r2.getAs[Double]("tau_b") == 0.0)
    assert(math.abs(r2.getAs[Double]("frac_concordant") - 1.0 / 6) < 1e-6)
  }

  test("bordaTopK: exact ranks, n-rank scoring, consensus order, " +
    "and the k cutoff") {
    val s = spark
    import s.implicits._
    // a dominates both signals; b and c split; d trails
    val df = Seq(
      (1L, 40L, 9L), // a: rank 1 / rank 1 -> score 3+3 = 6
      (2L, 30L, 2L), // b: rank 2 / rank 4 -> 2+0 = 2
      (3L, 10L, 8L), // c: rank 4 / rank 2 -> 0+2 = 2
      (4L, 20L, 5L)) // d: rank 3 / rank 3 -> 1+1 = 2
      .toDF("id", "s1", "s2")
    val out = RankStats.bordaTopK(df, "id", Seq("s1", "s2"), k = 3)
      .orderBy("borda_rank").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("id") == 1L &&
      out(0).getAs[Long]("borda_score") == 6L)
    // b, c, d all score 2 -> id tie-break, only two fit in k=3
    assert(out(1).getAs[Long]("id") == 2L &&
      out(1).getAs[Long]("borda_score") == 2L)
    assert(out(2).getAs[Long]("id") == 3L)
    assert(out(1).getAs[Long]("rank_s1") == 2L &&
      out(1).getAs[Long]("rank_s2") == 4L)
  }
}
