package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 38: X327 linear CKA, X328 anisotropy, X329 hubness. */
class Wave38Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("anisotropy: identical vectors -> 1; orthogonal pair -> 0; " +
    "opposite pair -> -1 (all exact)") {
    val s = spark
    import s.implicits._
    def df(vs: Seq[Seq[Double]]) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    assert(Similarity.anisotropy(df(Seq(Seq(1.0, 2.0), Seq(1.0, 2.0),
      Seq(1.0, 2.0))), "vec_id", "v").head()
      .getAs[Double]("mean_cosine") == 1.0)
    assert(Similarity.anisotropy(df(Seq(Seq(1.0, 0.0),
      Seq(0.0, 1.0))), "vec_id", "v").head()
      .getAs[Double]("mean_cosine") == 0.0)
    assert(Similarity.anisotropy(df(Seq(Seq(1.0, 0.0),
      Seq(-1.0, 0.0))), "vec_id", "v").head()
      .getAs[Double]("mean_cosine") == -1.0)
  }

  test("ckaLinear: a view equal (or scaled 2x) to the other scores " +
    "CKA = 1 — scale invariance; an anti-correlated dim still " +
    "aligns (sign-invariant through the squared Frobenius)") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Seq(1.0, 5.0), Seq(2.0, 10.0)),
      (2L, Seq(3.0, 1.0), Seq(6.0, 2.0)),
      (3L, Seq(2.0, 4.0), Seq(4.0, 8.0)),
      (4L, Seq(5.0, 2.0), Seq(10.0, 4.0))).toDF("vec_id", "a", "b")
    val r = Similarity.ckaLinear(rows, "vec_id", col("a"), col("b"))
      .head()
    assert(r.getAs[Double]("cka") == 1.0)
    // negated second view: covariances flip sign, CKA unchanged
    val neg = rows.withColumn("b",
      expr("transform(b, x -> -x)"))
    assert(Similarity.ckaLinear(neg, "vec_id", col("a"), col("b"))
      .head().getAs[Double]("cka") == 1.0)
  }

  test("hubness: mean in-degree is exactly k (everyone emits k " +
    "edges); a central vector hubs, an anti-aligned one antihubs") {
    val s = spark
    import s.implicits._
    // center-ish cluster + one hub-like center + one anti-aligned
    val vs = Seq(
      (0L, Seq(1.0, 0.5)), // center: most similar to everyone
      (1L, Seq(1.0, 0.4)), (2L, Seq(1.0, 0.6)),
      (3L, Seq(0.9, 0.5)), (4L, Seq(1.1, 0.5)),
      (5L, Seq(-1.0, -0.5))) // anti-aligned: in nobody's top-k
      .toDF("vec_id", "v")
    val r = Similarity.hubness(vs, "vec_id", "v", k = 2).head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("mean_indegree") == 2.0)
    assert(r.getAs[Long]("max_indegree") >= 3L)
    assert(r.getAs[Long]("n_antihubs") >= 1L)
    assert(r.getAs[Long]("n_hubs") >= 1L) // >= 2k = 4 in-degree
  }
}
