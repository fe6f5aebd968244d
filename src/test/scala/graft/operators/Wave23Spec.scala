package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 23: X270 Gwet's AC1, X271 Wasserstein-1, X272 geometric
  * median.
  */
class Wave23Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("gwetAc1: the kappa-paradox fixture — 97% raw agreement on a " +
    "skewed label keeps AC1 high while kappa collapses") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(95)(("keep", "keep")) ++
      Seq.fill(2)(("drop", "drop")) ++ Seq.fill(3)(("keep", "drop"))
    val df = rows.toDF("a", "b")
    val r = RankEval.gwetAc1(df, "a", "b").head()
    assert(r.getAs[Long]("n_items") == 100L)
    assert(r.getAs[Double]("observed_agreement") == 0.97)
    // m_keep = 193, m_drop = 7 -> e = 1 - 37298/40000 = 0.06755
    assert(r.getAs[Double]("chance_agreement") == 0.06755)
    val expAc1 = (0.97 - 0.06755) / (1.0 - 0.06755)
    assert(math.abs(r.getAs[Double]("ac1") - expAc1) < 1e-6)
    val kappa = RankEval.cohensKappa(df, "a", "b").head()
      .getAs[Double]("kappa")
    assert(r.getAs[Double]("ac1") > 0.9 && kappa < 0.6,
      s"paradox not visible: ac1=${r.getAs[Double]("ac1")} k=$kappa")
  }

  test("wasserstein1: hand shifted sets integrate to the shift; " +
    "identical distributions are 0 and a constant shift is exact") {
    val s = spark
    import s.implicits._
    val df = Seq((0.0, true), (1.0, true), (1.0, false), (2.0, false))
      .toDF("v", "ia")
    assert(Hypothesis.wasserstein1(df, "v", col("ia")).head()
      .getAs[Double]("wasserstein1") == 1.0)
    val same = Seq((5.0, true), (7.0, true), (5.0, false),
      (7.0, false)).toDF("v", "ia")
    assert(Hypothesis.wasserstein1(same, "v", col("ia")).head()
      .getAs[Double]("wasserstein1") == 0.0)
    // shift by 3.5: W1 = 3.5 exactly (fractional values survive)
    val shift = (Seq(1.0, 2.0, 3.0).map((_, true)) ++
      Seq(4.5, 5.5, 6.5).map((_, false))).toDF("v", "ia")
    assert(Hypothesis.wasserstein1(shift, "v", col("ia")).head()
      .getAs[Double]("wasserstein1") == 3.5)
    // single distinct value: no segments, W1 = 0 with counts intact
    val one = Seq((4.0, true), (4.0, false), (4.0, false))
      .toDF("v", "ia")
    val o = Hypothesis.wasserstein1(one, "v", col("ia")).head()
    assert(o.getAs[Long]("n_a") == 1L && o.getAs[Long]("n_b") == 2L)
    assert(o.getAs[Double]("wasserstein1") == 0.0)
  }

  test("geometricMedian: one far outlier drags the mean but not the " +
    "median; a symmetric pair lands midway") {
    val s = spark
    import s.implicits._
    val pts = ((1 to 9).map(i => (i.toLong, Array(0.0f, 0.0f))) :+
      (10L, Array(100.0f, 100.0f))).toDF("vec_id", "embedding")
    val m = Similarity.geometricMedian(pts, "vec_id", "embedding",
        iters = 12)
      .collect().map(x => x.getAs[Long]("dim") ->
        x.getAs[Double]("median_component")).toMap
    // the mean is (10, 10); the geometric median stays near 0
    assert(math.abs(m(0L)) < 1.0 && math.abs(m(1L)) < 1.0,
      s"outlier dragged the median: $m")
    val pair = Seq((1L, Array(0.0f)), (2L, Array(10.0f)))
      .toDF("vec_id", "embedding")
    val mid = Similarity.geometricMedian(pair, "vec_id", "embedding",
      iters = 8).head().getAs[Double]("median_component")
    assert(mid > 2.0 && mid < 8.0, s"pair median off-segment: $mid")
  }
}
