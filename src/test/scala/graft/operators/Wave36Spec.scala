package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 36: X320 RMST, X321 character coverage, X322
  * Jonckheere-Terpstra.
  */
class Wave36Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("rmst: hand KM fixture integrates to exactly 2.75 at tau=6; " +
    "no events by tau means RMST = tau exactly") {
    val s = spark
    import s.implicits._
    val subj = Seq((1L, true), (3L, false), (2L, true), (4L, true))
      .toDF("t", "ev")
    val r = Funnel.rmst(subj, "t", col("ev"), tau = 6L).head()
    assert(r.getAs[Long]("n_subjects") == 4L)
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Double]("rmst") == 2.75)
    val cens = Seq((9L, false), (12L, false)).toDF("t", "ev")
    assert(Funnel.rmst(cens, "t", col("ev"), tau = 5L).head()
      .getAs[Double]("rmst") == 5.0)
    // events beyond tau don't count either
    val late = Seq((10L, true), (12L, true)).toDF("t", "ev")
    assert(Funnel.rmst(late, "t", col("ev"), tau = 5L).head()
      .getAs[Double]("rmst") == 5.0)
  }

  test("charCoverage: hand corpus keeps the smallest prefix crossing " +
    "the target — 4 of 5 chars at 92.3% achieved for a 90% ask") {
    val s = spark
    import s.implicits._
    val docs = Seq("aaaa bbb cc d").toDF("text")
    val r = CorpusOps.charCoverage(docs, "text", coverage = 0.9)
      .head()
    assert(r.getAs[Long]("n_distinct_chars") == 5L)
    assert(r.getAs[Long]("total_chars") == 13L)
    assert(r.getAs[Long]("n_kept") == 4L)
    assert(r.getAs[Double]("coverage_achieved") == 0.923077)
    assert(r.getAs[String]("kept_charset") == " abc")
    // coverage 1.0 keeps everything
    val all = CorpusOps.charCoverage(docs, "text", coverage = 1.0)
      .head()
    assert(all.getAs[Long]("n_kept") == 5L)
    assert(all.getAs[Double]("coverage_achieved") == 1.0)
  }

  test("jonckheereTerpstra: perfectly ordered bands score every " +
    "cross pair (J = 12, z = 2.384158); reversed bands mirror below " +
    "the mean; ties count half") {
    val s = spark
    import s.implicits._
    val ordered = Seq((0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0),
      (2, 5.0), (2, 6.0)).toDF("b", "v")
    val r = Hypothesis.jonckheereTerpstra(ordered, col("b"), "v")
      .head()
    assert(r.getAs[Double]("j_stat") == 12.0)
    assert(r.getAs[Double]("expected") == 6.0)
    assert(r.getAs[Double]("z_stat") == 2.384158)
    val reversed = Seq((0, 5.0), (0, 6.0), (1, 3.0), (1, 4.0),
      (2, 1.0), (2, 2.0)).toDF("b", "v")
    assert(Hypothesis.jonckheereTerpstra(reversed, col("b"), "v")
      .head().getAs[Double]("z_stat") == -2.384158)
    // all values tied: every cross pair contributes exactly 1/2
    val tied = Seq((0, 7.0), (0, 7.0), (1, 7.0), (2, 7.0))
      .toDF("b", "v")
    assert(Hypothesis.jonckheereTerpstra(tied, col("b"), "v").head()
      .getAs[Double]("j_stat") == 2.5) // (2*1 + 2*1 + 1*1)/2
  }
}
