package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 16: X247 Burrows' Delta, X248 blocking quality, X249
  * path rollup, X250 A-ES weighted top-k sample.
  */
class Wave16Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("burrowsDelta: mirrored two-group frequencies give delta 2 " +
    "(both words at z = ±1); identical groups give 0") {
    val s = spark
    import s.implicits._
    val df = Seq(("A", "the the a"), ("B", "the a a"))
      .toDF("g", "text")
    val r = Stylometry.burrowsDelta(df, "g", "text", topM = 5).head()
    assert(r.getAs[Long]("n_words") == 2L)
    assert(math.abs(r.getAs[Double]("delta") - 2.0) < 1e-5)
    val same = Seq(("A", "x y x"), ("B", "x y x")).toDF("g", "text")
    assert(Stylometry.burrowsDelta(same, "g", "text", topM = 5)
      .head().getAs[Double]("delta") == 0.0)
  }

  test("blockingQuality: hand pair sets — RR/PC/PQ/F by hand; " +
    "orientation and duplicates canonicalize away") {
    val s = spark
    import s.implicits._
    val cand = Seq((2L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val truth = Seq((1L, 2L), (4L, 3L)).toDF("a", "b")
    val r = RankEval.blockingQuality(cand, truth, nRecords = 4L)
      .head()
    assert(r.getAs[Long]("n_candidates") == 2L) // (1,2) deduped
    assert(r.getAs[Long]("n_truth") == 2L)
    assert(r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Double]("reduction_ratio") == 0.666667) // 1 - 2/6
    assert(r.getAs[Double]("pair_completeness") == 0.5)
    assert(r.getAs[Double]("pair_quality") == 0.5)
    assert(r.getAs[Double]("f_pc_rr") == 0.571429) // 4/7
    // closed-form equi-key variant == pair-table variant, without
    // ever enumerating a pair
    val recs = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"),
      (4L, "b", "y"), (5L, "b", "y")).toDF("id", "ck", "tk")
    val fromKeys = RankEval.blockingQualityFromKeys(recs,
      Seq(col("ck")), Seq(col("tk"))).head()
    val cand2 = recs.as("x").join(recs.as("y"),
        col("x.ck") === col("y.ck") && col("x.id") < col("y.id"))
      .select(col("x.id").as("p1"), col("y.id").as("p2"))
    val truth2 = recs.as("x").join(recs.as("y"),
        col("x.tk") === col("y.tk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("p1"), col("y.id").as("p2"))
    val fromPairs = RankEval.blockingQuality(cand2, truth2, 5L).head()
    assert(fromKeys.getAs[Long]("n_candidates") ==
      fromPairs.getAs[Long]("n_candidates"))
    assert(fromKeys.getAs[Long]("n_truth") ==
      fromPairs.getAs[Long]("n_truth"))
    assert(fromKeys.getAs[Long]("n_hits") ==
      fromPairs.getAs[Long]("n_hits"))
    assert(fromKeys.getAs[Double]("reduction_ratio") ==
      fromPairs.getAs[Double]("reduction_ratio"))
    assert(fromKeys.getAs[Double]("pair_completeness") ==
      fromPairs.getAs[Double]("pair_completeness"))
  }

  test("pathRollup: host + prefix counts by hand; ports strip, " +
    "case folds, bare roots roll into depth 0 only") {
    val s = spark
    import s.implicits._
    val urls = Seq("https://A.com:8080/x/y", "https://a.com/x/z",
      "https://b.com/").toDF("url")
    val r = CorpusOps.pathRollup(urls, "url", maxDepth = 3)
      .collect().map(x => (x.getAs[String]("prefix"),
        x.getAs[Long]("depth")) -> x.getAs[Long]("n_docs")).toMap
    assert(r(("a.com", 0L)) == 2L)
    assert(r(("b.com", 0L)) == 1L)
    assert(r(("a.com/x", 1L)) == 2L)
    assert(r(("a.com/x/y", 2L)) == 1L)
    assert(r(("a.com/x/z", 2L)) == 1L)
    assert(!r.contains(("b.com/", 1L)) && r.size == 5)
  }

  test("weightedTopK: exactly k rows, zero weights excluded, a " +
    "dominant weight reliably samples first") {
    val s = spark
    import s.implicits._
    val df = ((1 to 30).map(i => (i.toLong, 1.0)) ++
      Seq((99L, 100000.0), (100L, 0.0))).toDF("id", "w")
    val r = CorpusOps.weightedTopK(df, "id", "w", k = 5)
      .collect()
    assert(r.length == 5)
    assert(!r.exists(_.getAs[Long]("id") == 100L)) // zero weight
    assert(r.head.getAs[Long]("id") == 99L,
      "dominant weight not sampled first")
    // deterministic: same call, same sample
    val again = CorpusOps.weightedTopK(df, "id", "w", k = 5).collect()
    assert(r.map(_.getAs[Long]("id")).toSeq ==
      again.map(_.getAs[Long]("id")).toSeq)
  }
}
