package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 39: X330 standardized residuals, X331 unseen mass. */
class Wave39Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("stdResiduals: a perfectly independent table has all-zero " +
    "residuals; a diagonal table pushes the diagonal positive and " +
    "the off-diagonal negative symmetrically") {
    val s = spark
    import s.implicits._
    val indep = (for { x <- Seq("a", "b"); y <- Seq("u", "v");
      _ <- 1 to 5 } yield (x, y)).toDF("x", "y")
    val ri = CorpusOps.stdResiduals(indep, "x", "y").collect()
    assert(ri.forall(_.getAs[Double]("std_residual") == 0.0))
    assert(ri.forall(_.getAs[Double]("expected") == 5.0))
    val diag = (Seq.fill(9)(("a", "u")) ++ Seq.fill(1)(("a", "v")) ++
      Seq.fill(1)(("b", "u")) ++ Seq.fill(9)(("b", "v")))
      .toDF("x", "y")
    val rd = CorpusOps.stdResiduals(diag, "x", "y")
      .collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y")) -> r)
      .toMap
    assert(rd(("a", "u")).getAs[Double]("std_residual") > 2.0)
    assert(rd(("a", "v")).getAs[Double]("std_residual") < -2.0)
    // 2x2 standardized residuals are equal in magnitude
    assert(rd(("a", "u")).getAs[Double]("std_residual") ==
      -rd(("a", "v")).getAs[Double]("std_residual"))
  }

  test("unseenMass: hapax share is exact; a saturated slice scores " +
    "near zero while a fresh slice scores high") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("fresh", "alpha beta gamma delta"), // 4 tokens, all hapax
      ("stale", "the the the the the cat")) // 6 tokens, 1 hapax
      .toDF("source", "text")
    val r = CorpusOps.unseenMass(docs, "text", "source")
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    assert(r("fresh").getAs[Long]("n_tokens") == 4L)
    assert(r("fresh").getAs[Long]("n_hapaxes") == 4L)
    assert(r("fresh").getAs[Double]("p_unseen") == 1.0)
    assert(r("stale").getAs[Long]("n_types") == 2L)
    assert(r("stale").getAs[Double]("p_unseen") == 0.166667)
    assert(r("stale").getAs[Double]("type_token_ratio") == 0.333333)
  }
}
