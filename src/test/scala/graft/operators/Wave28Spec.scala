package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 28: X288 log-rank, X289 effect sizes, X290 MDE/power,
  * X291 Neyman allocation.
  */
class Wave28Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("logRank: hand 4-subject fixture — censoring leaves the risk " +
    "set silently, single-subject times add no variance; identical " +
    "groups with no variance -> NULL z") {
    val s = spark
    import s.implicits._
    // A: event@1, censored@3; B: event@2, event@4
    val subj = Seq((1L, true, true), (3L, false, true),
      (2L, true, false), (4L, true, false)).toDF("t", "ev", "grp")
    val r = Funnel.logRank(subj, "t", col("ev"), col("grp")).head()
    assert(r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("observed_a") == 1L)
    assert(r.getAs[Double]("expected_a") == 0.833333)
    assert(r.getAs[Double]("z_stat") == 0.242536)
    // everyone dies at the same instant: V = 0 -> NULL z
    val flat = Seq((5L, true, true), (5L, true, false))
      .toDF("t", "ev", "grp")
    val f = Funnel.logRank(flat, "t", col("ev"), col("grp")).head()
    assert(f.isNullAt(f.fieldIndex("z_stat")))
    assert(f.getAs[Double]("expected_a") == 1.0)
  }

  test("effectSizes: hand fixture d = 0.707107, Hedges g shrinks it " +
    "to 0.404061, Glass uses the B-side SD; zero pooled SD -> NULL") {
    val s = spark
    import s.implicits._
    val df = Seq((2.0, true), (4.0, true), (1.0, false), (3.0, false))
      .toDF("v", "a")
    val r = Hypothesis.effectSizes(df, "v", col("a")).head()
    assert(r.getAs[Double]("mean_a") == 3.0)
    assert(r.getAs[Double]("mean_b") == 2.0)
    assert(r.getAs[Double]("cohens_d") == 0.707107)
    assert(r.getAs[Double]("hedges_g") == 0.404061)
    assert(r.getAs[Double]("glass_delta") == 0.707107)
    val const = Seq((1.0, true), (1.0, true), (1.0, false),
      (1.0, false)).toDF("v", "a")
    val c = Hypothesis.effectSizes(const, "v", col("a")).head()
    assert(c.isNullAt(c.fieldIndex("cohens_d")))
  }

  test("mdePower: n=100 at 10% baseline can only see an 11.9-point " +
    "absolute move; degenerate rates are NULL; bigger n shrinks MDE " +
    "by sqrt") {
    val s = spark
    import s.implicits._
    val df = ((1 to 10).map(i => ("s", true)) ++
      (1 to 90).map(i => ("s", false)) ++
      (1 to 50).map(i => ("z", false))).toDF("g", "x")
    val r = Hypothesis.mdePower(df, "g", col("x"))
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r("s").getAs[Double]("rate") == 0.1)
    assert(r("s").getAs[Double]("mde_abs") == 0.118861)
    assert(r("s").getAs[Double]("mde_rel") == 1.188612)
    assert(r("z").isNullAt(r("z").fieldIndex("mde_abs")))
    // 4x the n halves the MDE
    val big = ((1 to 40).map(_ => ("b", true)) ++
      (1 to 360).map(_ => ("b", false))).toDF("g", "x")
    val m4 = Hypothesis.mdePower(big, "g", col("x")).head()
      .getAs[Double]("mde_abs")
    assert(math.abs(m4 - 0.118861 / 2) < 1e-5)
  }

  test("neymanAllocation: zero-variance strata earn zero budget; " +
    "shares track N_h*S_h and sum to ~1; singleton strata stay " +
    "visible at share 0") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(10)(("flat", 7.0)) ++
      Seq(("wild", 0.0), ("wild", 20.0), ("wild", 0.0),
        ("wild", 20.0)) ++
      Seq(("mild", 9.0), ("mild", 11.0)) ++
      Seq(("solo", 3.0))).toDF("st", "v")
    val r = DistStats.neymanAllocation(df, "st", "v", budget = 100L)
      .collect().map(x => x.getAs[String]("st") -> x).toMap
    assert(r("flat").getAs[Double]("alloc_share") == 0.0)
    assert(r("flat").getAs[Long]("n_alloc") == 0L)
    assert(r("solo").getAs[Double]("alloc_share") == 0.0)
    // wild: n=4, sd=11.547005 -> w=46.18802; mild: n=2, sd=1.414214
    // -> w=2.828427; shares 0.942296 / 0.057704
    assert(math.abs(r("wild").getAs[Double]("alloc_share") -
      0.942296) < 1e-6)
    assert(r("wild").getAs[Long]("n_alloc") == 94L)
    assert(math.abs(r("mild").getAs[Double]("alloc_share") -
      0.057704) < 1e-6)
    assert(r("mild").getAs[Long]("n_alloc") == 6L)
    assert(r("mild").getAs[Double]("stratum_sd") == 1.414214)
  }
}
