package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 14: X236 HLL set algebra, X237 Murphy decomposition,
  * X238 paired permutation test, X239 Cochran-Armitage trend, X240
  * largest-remainder apportionment.
  */
class Wave14Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("Hll.setAlgebra: small known sets — union/intersect/jaccard " +
    "recover the true overlap within HLL error and the I-E identity " +
    "holds") {
    val s = spark
    import s.implicits._
    // A = 1..100, B = 51..150 — true union 150, intersect 50. The
    // portable register HLL (m=1024, linear-counting branch at this
    // cardinality) estimates within a few % — unlike DataSketches'
    // sparse-exact mode there is no exact small-set regime, which is
    // the price of the engine-independent integer estimator.
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (51 to 150).map(i => ("b", i.toLong))).toDF("g", "k")
    val sk = Hll.groupSketches(df, "g", "k")
    val r = Hll.setAlgebra(sk, "g").head()
    assert(r.getAs[String]("group_a") == "a")
    assert(math.abs(r.getAs[Long]("est_a") - 100L) <= 8L)
    assert(math.abs(r.getAs[Long]("est_b") - 100L) <= 8L)
    assert(math.abs(r.getAs[Long]("est_union") - 150L) <= 12L)
    assert(math.abs(r.getAs[Long]("est_intersect") - 50L) <= 20L)
    // I-E identity by construction (clamped at 0)
    val inter = r.getAs[Long]("est_intersect")
    val union = r.getAs[Long]("est_union")
    assert(inter ==
      math.max(0L, r.getAs[Long]("est_a") + r.getAs[Long]("est_b") -
        union))
    // jaccard is exactly the reported intersection over union —
    // mirror Spark round()'s HALF_UP, not math.rint's half-even (an
    // exact .5 tie at the 6th decimal would fail spuriously)
    assert(r.getAs[Double]("jaccard_est") ==
      BigDecimal(inter.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("murphyDecomposition: perfect forecasts have zero Brier and " +
    "reliability with resolution = uncertainty; a constant 0.5 " +
    "forecast has zero resolution") {
    val s = spark
    import s.implicits._
    val perfect = (Seq.fill(6)((1.0, true)) ++ Seq.fill(4)((0.0, false)))
      .toDF("p", "y")
    val r = Calibrate.murphyDecomposition(perfect, "p", "y").head()
    assert(r.getAs[Double]("brier") == 0.0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("resolution") == 0.24) // = unc = .6*.4
    assert(r.getAs[Double]("uncertainty") == 0.24)
    assert(r.getAs[Double]("residual") == 0.0)
    val flat = (Seq.fill(5)((0.5, true)) ++ Seq.fill(5)((0.5, false)))
      .toDF("p", "y")
    val f = Calibrate.murphyDecomposition(flat, "p", "y").head()
    assert(f.getAs[Double]("brier") == 0.25)
    assert(f.getAs[Double]("resolution") == 0.0)
    assert(f.getAs[Double]("reliability") == 0.0)
    assert(f.getAs[Double]("uncertainty") == 0.25)
  }

  test("pairedPermutation: zero diffs are maximally null (p = 1); a " +
    "consistent shift is detected; p is an exact add-one rational") {
    val s = spark
    import s.implicits._
    val zero = (1 to 20).map(i => (i.toLong, 0.0)).toDF("id", "d")
    val rz = Hypothesis.pairedPermutation(zero, "id", col("d"), b = 99)
      .head()
    assert(rz.getAs[Double]("p_value") == 1.0)
    assert(rz.getAs[Double]("mean_diff") == 0.0)
    val shift = (1 to 20).map(i => (i.toLong, 1.0)).toDF("id", "d")
    val rs = Hypothesis.pairedPermutation(shift, "id", col("d"), b = 99)
      .head()
    assert(rs.getAs[Double]("mean_diff") == 1.0)
    assert(rs.getAs[Double]("p_value") < 0.11,
      s"consistent shift not detected: ${rs.getAs[Double]("p_value")}")
    // p = (ge+1)/(b+1) exactly: with all-equal |T_b| impossible to
    // exceed n except the all-plus flip(s) -> p*(b+1) is an integer
    assert((rs.getAs[Double]("p_value") * 100.0).round ==
      rs.getAs[Double]("p_value") * 100.0)
  }

  test("cochranArmitage: hand monotone ladder gives z = 2 exactly; " +
    "degenerate pooled rate voids z") {
    val s = spark
    import s.implicits._
    // bands 0,1,2 with rates 0/2, 1/2, 2/2 -> num = 2, v = 1, z = 2
    val df = Seq((0, false), (0, false), (1, true), (1, false),
      (2, true), (2, true)).toDF("t", "y")
    val r = Hypothesis.cochranArmitage(df, col("t"), col("y")).head()
    assert(r.getAs[Long]("n_bands") == 3L)
    assert(r.getAs[Double]("pooled_rate") == 0.5)
    assert(r.getAs[Double]("z_trend") == 2.0)
    val allPass = Seq((0, true), (1, true)).toDF("t", "y")
    val ra = Hypothesis.cochranArmitage(allPass, col("t"), col("y"))
      .head()
    assert(ra.isNullAt(ra.fieldIndex("z_trend")))
  }

  test("largestRemainder: hand case allocates ties by key order and " +
    "the quota law sums exactly to the budget") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c"))
      .toDF("st")
    val r = Apportion.largestRemainder(df, Seq("st"), total = 10L)
      .collect().map(x => x.getAs[String]("st") ->
        (x.getAs[Long]("floor_quota"), x.getAs[Long]("remainder_rank"),
          x.getAs[Long]("quota"))).toMap
    // N=11: a 50/11=4 r6, b 30/11=2 r8, c 30/11=2 r8; 2 left ->
    // b and c (tie broken by key) get +1
    assert(r("a") == ((4L, 3L, 4L)))
    assert(r("b") == ((2L, 1L, 3L)))
    assert(r("c") == ((2L, 2L, 3L)))
    assert(r.values.map(_._3).sum == 10L)
    // law: any skewed mix still sums to the budget exactly
    val skew = (Seq.fill(97)("x") ++ Seq.fill(2)("y") ++ Seq("z"))
      .toDF("st")
    val q = Apportion.largestRemainder(skew, Seq("st"), total = 7L)
      .collect().map(_.getAs[Long]("quota")).sum
    assert(q == 7L)
  }
}
