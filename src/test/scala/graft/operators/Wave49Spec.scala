package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Wave 49 (X367–X368): one-sample KS vs Uniform, pair-cosine
  * histogram.
  */
class Wave49Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X367 ksUniformTest ------------------------------------------------

  test("ksUniformTest: a perfect uniform grid reads D = 1/(2n)·2 = " +
    "1/n at the jump bottoms; a point mass reads the full gap") {
    // values at 1,3,5,7,9 over [0,10]: F jumps at T = .1,.3,.5,.7,.9
    // top gap |i/5 - (2i-1)/10| = 1/10 each side
    val grid = Seq(1.0, 3.0, 5.0, 7.0, 9.0).toDF("v")
    val r = Hypothesis.ksUniformTest(grid, "v", 0.0, 10.0).collect()(0)
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("ks_d") == 0.1)
    // all mass at the left edge: D -> |1 - 0| at v=0's top
    val point = Seq.fill(4)(0.0).toDF("v")
    val r2 = Hypothesis.ksUniformTest(point, "v", 0.0, 10.0)
      .collect()(0)
    assert(r2.getAs[Double]("ks_d") == 1.0)
  }

  test("ksUniformTest clamps the theoretical CDF outside [lo, hi]") {
    val r = Hypothesis.ksUniformTest(Seq(-5.0, 15.0).toDF("v"),
      "v", 0.0, 10.0).collect()(0)
    // at v=-5: T=0, F_hi=0.5 -> gap .5; at v=15: T=1, F_lo=.5 -> .5
    assert(r.getAs[Double]("ks_d") == 0.5)
  }

  // ---- X368 pairCosineHistogram --------------------------------------------

  test("pairCosineHistogram: hand-built pairings land in the exact " +
    "bins (identical -> top bin, opposite -> bottom, orthogonal -> " +
    "boundary-up)") {
    // ranks 0..2 pair with 3..5: (a,d) identical, (b,e) opposite,
    // (c,f) orthogonal
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(0.0f, -1.0f)),
      (5L, Seq(1.0f, -1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.pairCosineHistogram(vecs, "vec_id",
        "embedding", bins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // cos 1 -> bin min(3, floor(2/2*4)) = 3; cos -1 -> bin 0;
    // cos 0 -> floor(0.5*4) = 2
    assert(out == Map(3L -> 1L, 0L -> 1L, 2L -> 1L))
  }

  test("pairCosineHistogram: odd corpus leaves one vector unpaired; " +
    "bin edges cover [-1, 1]") {
    val vecs = (0L to 4L).map(i => (i, Seq(1.0f, i.toFloat)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.pairCosineHistogram(vecs, "vec_id",
      "embedding", bins = 10).collect()
    assert(rows.map(_.getLong(3)).sum == 2) // 5 vecs -> 2 pairs
    rows.foreach { r =>
      assert(r.getDouble(1) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(2) > r.getDouble(1))
    }
  }
}
