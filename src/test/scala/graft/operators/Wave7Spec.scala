package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 7: X207 Fleiss' kappa, X208 FD scan, X209 mutual NN,
  * X210 seasonal profile, X211 randomized response.
  */
class Wave7Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("fleissKappa: perfect agreement gives 1; all-distinct raters " +
    "give the hand-computed -0.5") {
    val s = spark
    import s.implicits._
    val perfect = Seq((1L, "a", "a", "a"), (2L, "b", "b", "b"))
      .toDF("i", "r1", "r2", "r3")
    val rp = RankEval.fleissKappa(perfect, "i", Seq("r1", "r2", "r3"))
      .head()
    assert(rp.getAs[Double]("p_bar") == 1.0)
    assert(rp.getAs[Double]("kappa") == 1.0)
    // every item rated (a,b,c): P_i = 0, P_e = 1/3, kappa = -0.5
    val split = Seq((1L, "a", "b", "c"), (2L, "a", "b", "c"))
      .toDF("i", "r1", "r2", "r3")
    val rs = RankEval.fleissKappa(split, "i", Seq("r1", "r2", "r3"))
      .head()
    assert(rs.getAs[Double]("p_bar") == 0.0)
    assert(rs.getAs[Double]("kappa") == -0.5)
    assert(rs.getAs[Long]("n_categories") == 3L)
  }

  test("fdScan: a real dependency holds at rate 0; a 2-of-3 " +
    "violation reports exactly 0.25") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x", "p"), (1L, "x", "p"), (1L, "y", "p"),
      (2L, "z", "q")).toDF("a", "b", "c")
    val out = Constraints.fdScan(df, Seq("a" -> "b", "a" -> "c"))
      .collect().map(r => r.getAs[String]("dependent") ->
        (r.getAs[Double]("violation_rate"), r.getAs[Boolean]("holds")))
      .toMap
    assert(out("c") == (0.0, true))
    assert(out("b") == (0.25, false))
  }

  test("mutualNearest: reciprocal pairs survive, a one-directional " +
    "satellite does not") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.05f, 0.95f)),
      (5L, Array(0.7f, 0.71f))).toDF("id", "v")
    val out = Similarity.mutualNearest(vecs, "id", "v").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(out == Set((1L, 2L), (3L, 4L)), s"got $out")
  }

  test("seasonalProfile: hand hour means and the dow-0 Sunday " +
    "convention") {
    val s = spark
    import s.implicits._
    // 2024-03-03 is a Sunday
    val ev = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-03-03 03:10:00"), 1.0),
      ("k", java.sql.Timestamp.valueOf("2024-03-03 03:50:00"), 3.0),
      ("k", java.sql.Timestamp.valueOf("2024-03-04 07:00:00"), 10.0))
      .toDF("g", "ts", "v")
    val out = TimeSeries.seasonalProfile(ev, "g", "ts", "v").collect()
      .map(r => (r.getAs[String]("grain"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_value"))).toMap
    assert(out(("hour", 3L)) == (2L, 2.0))
    assert(out(("hour", 7L)) == (1L, 10.0))
    assert(out(("dow", 0L)) == (2L, 2.0)) // Sunday
    assert(out(("dow", 1L)) == (1L, 10.0)) // Monday
  }

  test("rrDebias: deterministic under a fixed salt, observed counts " +
    "conserve n, and the estimator satisfies its own identity") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (i, s"c${i % 3}")).toDF("id", "cat")
    val out = Privacy.rrDebias(df, "id", "cat", p = 0.75, salt = "t:")
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("observed_count"),
          r.getAs[Double]("est_count"))).toMap
    val out2 = Privacy.rrDebias(df, "id", "cat", p = 0.75, salt = "t:")
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("observed_count"),
          r.getAs[Double]("est_count"))).toMap
    assert(out == out2, "must be salt-deterministic")
    assert(out.values.map(_._1).sum == 300L)
    assert(out.values.map(_._2).sum == 300L)
    out.values.foreach { case (_, obs, est) =>
      val want = (obs - 300.0 * 0.25 / 3) / 0.75
      assert(math.abs(est - want) < 1e-6)
    }
    // the debiased estimates should land near the true 100/100/100
    out.values.foreach { case (tc, _, est) =>
      assert(math.abs(est - tc) < 40, s"estimate $est far from $tc")
    }
  }
}
