package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 42 (X337–X342): Brunner-Munzel, Cliff's delta / VD-A,
  * Somers' D, Cramér's V, the Poisson rate gate, and CUPED.
  */
class Wave42Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X337 brunnerMunzel ------------------------------------------

  /** Plain-Scala replay of the Brunner-Munzel statistic (midranks via
    * sorting, the scipy.stats.brunnermunzel formula) — the spec
    * oracle, independent of the grid/cumulative implementation.
    */
  private def bmReference(a: Seq[Double], b: Seq[Double])
      : (Double, Double) = {
    def midranks(xs: Seq[Double], in: Seq[Double]): Seq[Double] =
      xs.map { x =>
        val below = in.count(_ < x)
        val eq = in.count(_ == x)
        below + (eq + 1.0) / 2.0
      }
    val all = a ++ b
    val (na, nb) = (a.size.toDouble, b.size.toDouble)
    val rca = midranks(a, all)
    val rcb = midranks(b, all)
    val ra = midranks(a, a)
    val rb = midranks(b, b)
    val (mca, mcb) = (rca.sum / na, rcb.sum / nb)
    val sa = rca.zip(ra).map { case (rc, r) =>
      math.pow(rc - r - mca + (na + 1) / 2.0, 2)
    }.sum / (na - 1)
    val sb = rcb.zip(rb).map { case (rc, r) =>
      math.pow(rc - r - mcb + (nb + 1) / 2.0, 2)
    }.sum / (nb - 1)
    val w = na * nb * (mcb - mca) / ((na + nb) * math.sqrt(na * sa + nb * sb))
    val pHat = (mcb - (nb + 1) / 2.0) / na
    (pHat, w)
  }

  test("brunnerMunzel matches an independent plain-Scala replay " +
    "(ties, unequal sizes, unequal spreads)") {
    val a = Seq(1.0, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1)
    val b = Seq(3.0, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4)
    val df = (a.map(v => (v, true)) ++ b.map(v => (v, false)))
      .toDF("v", "isa")
    val got = Hypothesis.brunnerMunzel(df, "v", col("isa")).collect()(0)
    val (pHat, w) = bmReference(a, b)
    assert(got.getAs[Long]("n_a") == 14 && got.getAs[Long]("n_b") == 11)
    assert(got.getAs[Double]("p_hat") ==
      BigDecimal(pHat).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(math.abs(got.getAs[Double]("w_stat") - w) < 1e-6, s"$got vs $w")
  }

  test("brunnerMunzel: identical distributions give p_hat 0.5; " +
    "degenerate variance gives NULL w") {
    val df = (1 to 10).flatMap(i =>
      Seq((i.toDouble, true), (i.toDouble, false))).toDF("v", "isa")
    val r = Hypothesis.brunnerMunzel(df, "v", col("isa")).collect()(0)
    assert(r.getAs[Double]("p_hat") == 0.5)
    val tied = Seq((1.0, true), (1.0, true), (1.0, false), (1.0, false))
      .toDF("v", "isa")
    assert(Hypothesis.brunnerMunzel(tied, "v", col("isa"))
      .collect()(0).isNullAt(3))
  }

  // ---- X338 cliffsDelta --------------------------------------------

  test("cliffsDelta counts the exact pair classes") {
    val df = (Seq(1.0, 2, 3).map((_, true)) ++
      Seq(0.0, 2, 5).map((_, false))).toDF("v", "isa")
    val r = RankStats.cliffsDelta(df, "v", col("isa")).collect()(0)
    assert(r.getAs[Long]("n_gt") == 4 && r.getAs[Long]("n_eq") == 1 &&
      r.getAs[Long]("n_lt") == 4)
    assert(r.getAs[Double]("cliffs_delta") == 0.0)
    assert(r.getAs[Double]("vd_a") == 0.5)
  }

  test("cliffsDelta hits ±1 on fully separated groups") {
    val df = (Seq(10.0, 11).map((_, true)) ++
      Seq(1.0, 2).map((_, false))).toDF("v", "isa")
    val r = RankStats.cliffsDelta(df, "v", col("isa")).collect()(0)
    assert(r.getAs[Double]("cliffs_delta") == 1.0)
    assert(r.getAs[Double]("vd_a") == 1.0)
  }

  // ---- X339 somersD ------------------------------------------------

  test("somersD: hand-computed 2x2 (conc 4, disc 1, 4 one-sided ties " +
    "each way)") {
    val rows = Seq.fill(2)((0L, 0L)) ++ Seq((0L, 1L), (1L, 0L)) ++
      Seq.fill(2)((1L, 1L))
    val r = CorpusOps.somersD(rows.toDF("x", "y"), "x", "y").collect()(0)
    assert(r.getAs[Long]("concordant") == 4 &&
      r.getAs[Long]("discordant") == 1)
    assert(r.getAs[Long]("ties_x_only") == 4 &&
      r.getAs[Long]("ties_y_only") == 4)
    assert(r.getAs[Double]("d_yx") == 0.333333)
    assert(r.getAs[Double]("d_xy") == 0.333333)
  }

  test("somersD: binary predictor equals 2*AUC-1 (perfect ranking " +
    "gives 1.0)") {
    val rows = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 1L))
    val r = CorpusOps.somersD(rows.toDF("x", "y"), "x", "y").collect()(0)
    assert(r.getAs[Double]("d_yx") == 1.0)
  }

  // ---- X340 cramersV -----------------------------------------------

  test("cramersV: perfect association is exactly 1, independence 0") {
    val perfect = (Seq.fill(3)(("a", "u")) ++ Seq.fill(3)(("b", "v")))
      .toDF("x", "y")
    val r = CorpusOps.cramersV(perfect, "x", "y").collect()(0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
    assert(r.getAs[Double]("tschuprow_t") == 1.0)
    val indep = (for {
      x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 2
    } yield (x, y)).toDF("x", "y")
    val r2 = CorpusOps.cramersV(indep, "x", "y").collect()(0)
    assert(r2.getAs[Double]("chi2") == 0.0 &&
      r2.getAs[Double]("cramers_v") == 0.0)
  }

  test("cramersV counts zero-observed cells into chi2") {
    // 2x2 with one empty cell: margins force e > 0 there
    val df = (Seq.fill(2)(("a", "u")) ++ Seq(("a", "v")) ++
      Seq.fill(3)(("b", "v"))).toDF("x", "y")
    val r = CorpusOps.cramersV(df, "x", "y").collect()(0)
    // chi2 by hand: margins rx=(3,3), cy=(2,4), n=6 ->
    // e=(1,2,1,2); cells o=(2,1,0,3) -> 1+0.5+1+0.5 = 3
    assert(r.getAs[Double]("chi2") == 3.0)
  }

  // ---- X341 poissonRateTest ----------------------------------------

  test("poissonRateTest: hand-computed Wald and conditional z") {
    // A: 10 events over 5 days; B: 4 events over 4 days
    val rows = Seq((true, 10L, 5L), (false, 4L, 4L))
      .toDF("isa", "k", "e")
    val r = Hypothesis.poissonRateTest(rows, col("isa"), "k", "e")
      .collect()(0)
    assert(r.getAs[Double]("rate_a") == 2.0 &&
      r.getAs[Double]("rate_b") == 1.0)
    assert(r.getAs[Double]("rate_ratio") == 2.0)
    assert(math.abs(r.getAs[Double]("z_wald") -
      1.0 / math.sqrt(10.0 / 25 + 4.0 / 16)) < 1e-6)
    val p = 5.0 / 9
    assert(math.abs(r.getAs[Double]("z_cond") -
      (10 - 14 * p) / math.sqrt(14 * p * (1 - p))) < 1e-6)
  }

  test("poissonRateTest: zero exposure on one side nulls the z's") {
    val rows = Seq((true, 3L, 2L), (false, 0L, 0L)).toDF("isa", "k", "e")
    val r = Hypothesis.poissonRateTest(rows, col("isa"), "k", "e")
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("z_wald")))
    assert(r.isNullAt(r.fieldIndex("rate_b")))
  }

  // ---- X342 cuped --------------------------------------------------

  test("cuped: a fully covariate-explained gap adjusts to zero with " +
    "var_reduction 1") {
    // y = 2x exactly; groups differ only through x
    val rows = Seq((2.0, 1.0, true), (4.0, 2.0, true),
      (6.0, 3.0, false), (8.0, 4.0, false)).toDF("y", "x", "isa")
    val r = Hypothesis.cuped(rows, "y", "x", col("isa")).collect()(0)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("diff_raw") == -4.0)
    assert(r.getAs[Double]("diff_adj") == 0.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
  }

  test("cuped: an uncorrelated covariate leaves the gap untouched") {
    val rows = Seq((10.0, 1.0, true), (10.0, 2.0, true),
      (4.0, 1.0, false), (4.0, 2.0, false)).toDF("y", "x", "isa")
    val r = Hypothesis.cuped(rows, "y", "x", col("isa")).collect()(0)
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("diff_raw") == 6.0)
    assert(r.getAs[Double]("diff_adj") == 6.0)
    assert(r.getAs[Double]("var_reduction") == 0.0)
  }
}
