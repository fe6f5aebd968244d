package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 55 (X408–X410): IPF raking, two-sample Kuiper, Bland-Altman
  * (the last is an inline query verified by its hash oracle).
  */
class Wave55Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X408 rakeWeights ------------------------------------------------------

  test("rakeWeights: a skewed 2x2 converges to uniform margins and " +
    "upweights the thin cells") {
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = DistStats.rakeWeights(rows.toDF("r", "c"), "r", "c",
        iters = 8)
      .collect()
      .map(x => (x.getAs[String]("r"), x.getAs[String]("c")) ->
        (x.getAs[Long]("n"), x.getAs[Long]("w_micro"))).toMap
    // target: every row mass and column mass = 60/2 = 30 (micro 3e7)
    val rowMass = Map("a" -> 0L, "b" -> 0L) ++
      out.groupBy(_._1._1).map { case (r, m) =>
        r -> m.values.map { case (n, w) => n * w }.sum
      }
    val colMass = out.groupBy(_._1._2).map { case (c, m) =>
      c -> m.values.map { case (n, w) => n * w }.sum
    }
    rowMass.values.foreach(v =>
      assert(math.abs(v - 30000000L) < 200000L, s"row mass $v"))
    colMass.values.foreach(v =>
      assert(math.abs(v - 30000000L) < 200000L, s"col mass $v"))
    // the fat (a,x) cell is downweighted, the thin (b,y) upweighted
    assert(out(("a", "x"))._2 < 1000000L)
    assert(out(("b", "y"))._2 > 1000000L)
  }

  test("rakeWeights: already-uniform margins leave weights at 1") {
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    val out = DistStats.rakeWeights(rows.toDF("r", "c"), "r", "c",
      iters = 3).collect()
    assert(out.forall(_.getAs[Long]("w_micro") == 1000000L))
  }

  // ---- X409 kuiperTest -------------------------------------------------------

  test("kuiperTest: disjoint supports give V = 1; two-sided " +
    "excursions add where KS keeps only the max") {
    val disjoint = Seq((1.0, true), (2.0, true), (3.0, false),
      (4.0, false)).toDF("v", "a")
    val r = Hypothesis.kuiperTest(disjoint, "v", col("a")).collect()(0)
    assert(r.getAs[Double]("d_plus") == 1.0)
    assert(r.getAs[Double]("d_minus") == 0.0)
    assert(r.getAs[Double]("kuiper_v") == 1.0)
    // A = {1,4} straddles B = {2,3}: both excursions are 0.5
    val straddle = Seq((1.0, true), (4.0, true), (2.0, false),
      (3.0, false)).toDF("v", "a")
    val s = Hypothesis.kuiperTest(straddle, "v", col("a")).collect()(0)
    assert(s.getAs[Double]("d_plus") == 0.5)
    assert(s.getAs[Double]("d_minus") == 0.5)
    assert(s.getAs[Double]("kuiper_v") == 1.0)
    val ks = Hypothesis.ksTest(straddle, "v", col("a")).collect()(0)
    assert(ks.getAs[Double]("ks_d") == 0.5) // KS sees half of it
  }

  test("kuiperTest: identical samples give V = 0") {
    val same = ((1 to 20).map(i => (i.toDouble, true)) ++
      (1 to 20).map(i => (i.toDouble, false))).toDF("v", "a")
    val r = Hypothesis.kuiperTest(same, "v", col("a")).collect()(0)
    assert(r.getAs[Double]("kuiper_v") == 0.0)
  }
}