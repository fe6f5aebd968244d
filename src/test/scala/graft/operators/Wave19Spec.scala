package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 19: X258 effective rank, X259 Hopkins statistic, X260
  * Qini uplift curve.
  */
class Wave19Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("effectiveRank: a 1-axis cloud scores 1, an isotropic cross " +
    "scores the full dimension") {
    val s = spark
    import s.implicits._
    val flat = Seq((1L, Array(0.0f, 0f)), (2L, Array(2.0f, 0f)),
      (3L, Array(4.0f, 0f))).toDF("vec_id", "embedding")
    val r1 = Similarity.effectiveRank(flat, "vec_id", "embedding")
      .head()
    assert(r1.getAs[Long]("dim") == 2L)
    assert(r1.getAs[Double]("effective_rank") == 1.0)
    val iso = Seq((1L, Array(1.0f, 0f)), (2L, Array(0f, 1.0f)),
      (3L, Array(-1.0f, 0f)), (4L, Array(0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.effectiveRank(iso, "vec_id", "embedding")
      .head()
    assert(r2.getAs[Double]("trace") == 1.0) // 0.5 + 0.5
    assert(r2.getAs[Double]("effective_rank") == 2.0)
  }

  test("hopkins: two tight far-apart blobs read clustered (H near " +
    "1); a regular lattice reads DISPERSED (H below 0.5 — more " +
    "regular than random, the textbook lattice reading)") {
    val s = spark
    import s.implicits._
    val blobs = ((1 to 20).map(i =>
      (i.toLong, Array(0.001f * i, 0.001f * i))) ++
      (21 to 40).map(i =>
        (i.toLong, Array(100f + 0.001f * i, 100f + 0.001f * i))))
      .toDF("vec_id", "embedding")
    val hb = Similarity.hopkins(blobs, "vec_id", "embedding", m = 10)
      .head().getAs[Double]("hopkins")
    assert(hb > 0.85, s"blobs should read clustered: $hb")
    val grid = (0 until 100).map { i =>
      (i.toLong, Array((i % 10).toFloat, (i / 10).toFloat))
    }.toDF("vec_id", "embedding")
    val hg = Similarity.hopkins(grid, "vec_id", "embedding", m = 10)
      .head().getAs[Double]("hopkins")
    assert(hg > 0.05 && hg < 0.5,
      s"lattice should read dispersed (< 0.5): $hg")
  }

  test("qiniCurve: hand two-step curve — incremental successes at " +
    "the top cut, zero uplift overall") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (2L, true, true), (2L, true, false),
      (2L, false, false), (2L, false, false),
      (1L, true, false), (1L, false, true))
      .toDF("s", "tr", "y")
    val r = RankEval.qiniCurve(rows, "s", col("tr"), col("y"))
      .orderBy(col("threshold").desc).collect()
    assert(r(0).getAs[Double]("qini") == 1.0) // 1 - 0*(2/2)
    assert(r(1).getAs[Double]("qini") == 0.0) // 1 - 1*(3/3)
    assert(r(1).getAs[Long]("n_treated") == 3L)
    // no control yet -> NULL, not a fabricated scale
    val noCtl = Seq((5L, true, true), (4L, false, false))
      .toDF("s", "tr", "y")
    val n = RankEval.qiniCurve(noCtl, "s", col("tr"), col("y"))
      .orderBy(col("threshold").desc).collect()
    assert(n(0).isNullAt(n(0).fieldIndex("qini")))
  }
}
