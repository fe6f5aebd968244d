package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 10: X219 Hill tail index, X220 Wilson interval. */
class Wave10Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("hillTailIndex: hand top-2 case, degenerate repeated head " +
    "gives NULL alpha, too-few values give an empty frame") {
    val s = spark
    import s.implicits._
    // top-2 = {8, 4}, x_3 = 2: alpha = 2 / (ln8 + ln4 - 2 ln2)
    //       = 2 / (3 ln 2) = 0.961797
    val df = Seq(8L, 4L, 2L, 1L).toDF("v")
    val r = DistStats.hillTailIndex(df, "v", k = 2).head()
    assert(r.getAs[Long]("x_k_plus_1") == 2L)
    assert(math.abs(r.getAs[Double]("alpha") -
      2.0 / (3 * math.log(2))) < 1e-6)
    // whole top-3 one repeated value -> zero denominator -> NULL
    val flat = Seq(8L, 8L, 8L, 1L).toDF("v")
    val rf = DistStats.hillTailIndex(flat, "v", k = 2).head()
    assert(rf.isNullAt(rf.fieldIndex("alpha")))
    // k+1 values required
    assert(DistStats.hillTailIndex(Seq(5L, 3L).toDF("v"), "v", k = 2)
      .count() == 0L)
  }

  test("mannKendall: monotone series hits the exact S and z; " +
    "constant series NULLs z through the tie correction") {
    val s = spark
    import s.implicits._
    // v = o over 5 points: S = 10, Var = 5*4*15/18, z = 9/sqrt(Var)
    val up = (0 to 4).map(i => ("k", i.toLong, i.toDouble))
      .toDF("g", "o", "v")
    val r = TimeSeries.mannKendall(up, "g", "o", "v").head()
    assert(r.getAs[Long]("s_stat") == 10L)
    assert(math.abs(r.getAs[Double]("z") -
      9.0 / math.sqrt(50.0 / 3)) < 1e-6)
    val flat = (0 to 4).map(i => ("k", i.toLong, 7.0))
      .toDF("g", "o", "v")
    val rf = TimeSeries.mannKendall(flat, "g", "o", "v").head()
    assert(rf.getAs[Long]("s_stat") == 0L)
    assert(rf.isNullAt(rf.fieldIndex("z")))
  }

  test("theilSen: perfect line recovers its slope; a single spike " +
    "cannot move the median slope") {
    val s = spark
    import s.implicits._
    val line = (0 to 4).map(i => ("k", i.toLong, 3.0 * i))
      .toDF("g", "o", "v")
    val r = TimeSeries.theilSen(line, "g", "o", "v").head()
    assert(r.getAs[Double]("median_slope") == 3.0)
    assert(r.getAs[Long]("n_pairs") == 10L)
    // o=[0,1,2], v=[0,10,2]: slopes {10, 1, -8} -> median 1
    val spike = Seq(("k", 0L, 0.0), ("k", 1L, 10.0), ("k", 2L, 2.0))
      .toDF("g", "o", "v")
    val rs = TimeSeries.theilSen(spike, "g", "o", "v").head()
    assert(rs.getAs[Double]("median_slope") == 1.0)
  }

  test("wilsonInterval: symmetric at p=0.5 with the closed-form " +
    "half-width; p=0 pins ci_lo to exactly 0") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(50)(("g", true)) ++ Seq.fill(50)(("g", false)) ++
      Seq.fill(10)(("z", false))).toDF("grp", "ok")
    val out = Hypothesis.wilsonInterval(df, "grp", $"ok").collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("rate"), r.getAs[Double]("ci_lo"),
          r.getAs[Double]("ci_hi"))).toMap
    val (rate, lo, hi) = out("g")
    assert(rate == 0.5)
    val z2 = 1.96 * 1.96
    val denom = 1.0 + z2 / 100
    val half = 1.96 * math.sqrt(0.25 / 100 + z2 / (4.0 * 100 * 100)) /
      denom
    assert(math.abs(lo - (0.5 - half)) < 1e-6)
    assert(math.abs(hi - (0.5 + half)) < 1e-6)
    // zero successes: the Wilson lower bound is exactly 0, the
    // upper stays positive and inside [0,1]
    val (r0, lo0, hi0) = out("z")
    assert(r0 == 0.0 && lo0 == 0.0 && hi0 > 0.0 && hi0 < 1.0)
  }
}
