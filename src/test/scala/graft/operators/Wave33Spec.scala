package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 33: X308 Monroe keyness, X309 Gries' DP dispersion,
  * X310 Ansari-Bradley, X311 Kendall's W.
  */
class Wave33Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("keyness: a welded side-A word tops side a, the side-B word " +
    "bottoms side b, and the prior shrinks a hapax below the " +
    "heavy hitter") {
    val s = spark
    import s.implicits._
    val docs = (1 to 10).map(_ => (true, "foo the common")) ++
      (1 to 10).map(_ => (false, "bar the common")) ++
      Seq((true, "hapax the common"))
    val r = Stylometry.keyness(docs.toDF("isa", "text"), "text",
      col("isa"), alpha0 = 10.0, minCount = 1L, topK = 5)
      .collect()
    val sideA = r.filter(_.getAs[String]("side") == "a")
      .sortBy(-_.getAs[Double]("z_score"))
    val sideB = r.filter(_.getAs[String]("side") == "b")
      .sortBy(_.getAs[Double]("z_score"))
    assert(sideA.head.getAs[String]("term") == "foo")
    assert(sideA.head.getAs[Double]("z_score") > 0)
    assert(sideB.head.getAs[String]("term") == "bar")
    assert(sideB.head.getAs[Double]("z_score") < 0)
    val hapaxZ = r.find(_.getAs[String]("term") == "hapax")
      .map(_.getAs[Double]("z_score")).getOrElse(0.0)
    assert(math.abs(hapaxZ) < sideA.head.getAs[Double]("z_score"),
      s"prior failed to shrink the hapax ($hapaxZ)")
  }

  test("termDispersion: a one-part clump scores DP = 1 - s_p = 0.5; " +
    "a term spread in corpus proportion scores low (0.166667 hand " +
    "case); ordering is clumpiest-first") {
    val s = spark
    import s.implicits._
    val docs = Seq(("p1", "c c c c f f f f"),
      ("p2", "f f f f f f f f")).toDF("part", "text")
    val r = CorpusOps.termDispersion(docs, "text", "part",
      minCount = 1L, topK = 10).collect()
    val byTerm = r.map(x => x.getAs[String]("term") -> x).toMap
    assert(byTerm("c").getAs[Double]("dp") == 0.5)
    assert(byTerm("c").getAs[Long]("n_parts") == 1L)
    assert(byTerm("f").getAs[Double]("dp") == 0.166667)
    assert(r.head.getAs[String]("term") == "c") // clumpiest first
  }

  test("ansariBradley: extremes-vs-center hand case AB = 2, " +
    "expected 3, z = -1.732051; identical distributions z ~ 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, true), (4.0, true), (2.0, false), (3.0, false))
      .toDF("v", "a")
    val r = Hypothesis.ansariBradley(df, "v", col("a")).head()
    assert(r.getAs[Double]("ab_stat") == 2.0)
    assert(r.getAs[Double]("expected") == 3.0)
    assert(r.getAs[Double]("z_stat") == -1.732051)
    // same values in both groups: every value ties, scores split
    // evenly, z exactly 0
    val same = Seq((1.0, true), (2.0, true), (1.0, false),
      (2.0, false)).toDF("v", "a")
    assert(Hypothesis.ansariBradley(same, "v", col("a")).head()
      .getAs[Double]("z_stat") == 0.0)
  }

  test("kendallW: unanimous rankers score W = 1; a latin square " +
    "scores 0; incomplete items drop and are counted; full ties " +
    "are NULL") {
    val s = spark
    import s.implicits._
    val unanimous = for { r <- Seq("r1", "r2", "r3");
      (i, v) <- Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)) }
      yield (r, i, v)
    val u = RankEval.kendallW(unanimous.toDF("r", "i", "v"), "r",
      "i", "v").head()
    assert(u.getAs[Long]("n_rankers") == 3L)
    assert(u.getAs[Long]("n_items") == 3L)
    assert(u.getAs[Double]("w") == 1.0)
    // rotated preferences cancel: rank sums equal -> W = 0
    val latin = Seq(
      ("r1", "a", 1.0), ("r1", "b", 2.0), ("r1", "c", 3.0),
      ("r2", "a", 2.0), ("r2", "b", 3.0), ("r2", "c", 1.0),
      ("r3", "a", 3.0), ("r3", "b", 1.0), ("r3", "c", 2.0))
    assert(RankEval.kendallW(latin.toDF("r", "i", "v"), "r", "i", "v")
      .head().getAs[Double]("w") == 0.0)
    // an item missing from one ranker drops
    val holey = unanimous :+ (("r1", "d", 9.0))
    val h = RankEval.kendallW(holey.toDF("r", "i", "v"), "r", "i",
      "v").head()
    assert(h.getAs[Long]("n_items") == 3L)
    assert(h.getAs[Long]("n_dropped_items") == 1L)
    val tied = for { r <- Seq("r1", "r2"); i <- Seq("a", "b") }
      yield (r, i, 5.0)
    val t = RankEval.kendallW(tied.toDF("r", "i", "v"), "r", "i", "v")
      .head()
    assert(t.isNullAt(t.fieldIndex("w")))
  }
}
