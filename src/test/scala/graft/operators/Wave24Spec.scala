package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 24: X273 direct standardization, X274 Kish effective
  * sample size.
  */
class Wave24Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("standardizedRates: the Simpson fixture — raw rates say 0.68 " +
    "vs 0.22, the mix-adjusted truth is 0.5 vs 0.4; missing strata " +
    "impute the group's raw rate and are counted") {
    val s = spark
    import s.implicits._
    def block(g: String, st: String, n: Int, x: Int) =
      (1 to n).map(i => (g, st, i <= x))
    val rows = block("A", "s1", 80, 64) ++ block("A", "s2", 20, 4) ++
      block("B", "s1", 20, 14) ++ block("B", "s2", 80, 8)
    val r = DistStats.standardizedRates(rows.toDF("g", "st", "y"),
        "g", col("st"), col("y"))
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r("A").getAs[Double]("raw_rate") == 0.68)
    assert(r("B").getAs[Double]("raw_rate") == 0.22)
    assert(r("A").getAs[Double]("std_rate") == 0.5)
    assert(r("B").getAs[Double]("std_rate") == 0.4)
    assert(r("A").getAs[Double]("composition_gap") == -0.18)
    assert(r("A").getAs[Long]("n_missing_strata") == 0L)
    // a group absent from a stratum imputes its raw rate, visibly
    val holey = (block("A", "s1", 4, 2) ++ block("A", "s2", 4, 2) ++
      block("C", "s1", 4, 4)).toDF("g", "st", "y")
    val c = DistStats.standardizedRates(holey, "g", col("st"),
        col("y"))
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(c("C").getAs[Long]("n_missing_strata") == 1L)
    assert(c("C").getAs[Double]("std_rate") == 1.0) // imputed raw
  }

  test("holmAdjust: textbook step-down — prefix-max adjusted values " +
    "and the reject prefix; Holm is never more permissive than BH") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0.005), ("b", 0.009), ("c", 0.05),
      ("d", 0.1), ("e", 0.2)).toDF("k", "p")
    val r = Hypothesis.holmAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank").collect()
    // raw p*(m-i+1) = [.025, .036, .15, .2, .2]; prefix-max keeps them
    assert(r.map(_.getAs[Double]("p_adj")).toSeq ==
      Seq(0.025, 0.036, 0.15, 0.2, 0.2))
    assert(r.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, false, false, false))
    // FWER <= FDR permissiveness: every Holm adj >= the BH adj
    val bh = Hypothesis.bhAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank").collect().map(_.getAs[Double]("p_adj"))
    r.map(_.getAs[Double]("p_adj")).zip(bh).foreach { case (h, b) =>
      assert(h >= b - 1e-9, s"Holm $h more permissive than BH $b")
    }
  }

  test("kishEffectiveSize: equal weights keep full power; one " +
    "dominant weight collapses n_eff toward 1") {
    val s = spark
    import s.implicits._
    val eq = Seq.fill(10)(2.5).toDF("w")
    val r = DistStats.kishEffectiveSize(eq, col("w")).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("n_effective") == 10.0)
    assert(r.getAs[Double]("efficiency") == 1.0)
    val skew = Seq(1000.0, 1.0, 1.0, 1.0).toDF("w")
    val k = DistStats.kishEffectiveSize(skew, col("w")).head()
    assert(math.abs(k.getAs[Double]("n_effective") - 1.006006) < 1e-4)
    // zero/negative weights are excluded from n
    val z = Seq(1.0, 0.0, -2.0).toDF("w")
    assert(DistStats.kishEffectiveSize(z, col("w")).head()
      .getAs[Long]("n") == 1L)
  }
}
