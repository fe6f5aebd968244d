package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 13: X231 diff-in-diff, X232 capture-recapture, X233
  * dataset cartography, X234 feature hashing, X235 JL projection.
  */
class Wave13Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("didEstimate: hand 2x2 — treatment delta minus control delta; " +
    "an empty cell voids the estimate but not the present means") {
    val s = spark
    import s.implicits._
    // ctrl pre {1,3}->2, ctrl post {2,4}->3, treat pre {5}, treat
    // post {10}: DiD = (10-5) - (3-2) = 4
    val df = Seq((1.0, false, false), (3.0, false, false),
      (2.0, false, true), (4.0, false, true),
      (5.0, true, false), (10.0, true, true)).toDF("v", "tr", "po")
    val r = Hypothesis.didEstimate(df, "v", col("tr"), col("po")).head()
    assert(r.getAs[Long]("n_ctrl_pre") == 2L)
    assert(r.getAs[Double]("mean_ctrl_pre") == 2.0)
    assert(r.getAs[Double]("mean_treat_post") == 10.0)
    assert(r.getAs[Double]("did") == 4.0)
    // no treated-pre observations -> did NULL, other means intact
    val holey = df.filter(!(col("tr") && !col("po")))
    val h = Hypothesis.didEstimate(holey, "v", col("tr"), col("po"))
      .head()
    assert(h.isNullAt(h.fieldIndex("did")))
    assert(h.getAs[Double]("mean_ctrl_post") == 3.0)
  }

  test("captureRecapture: hand sets — LP and Chapman estimates; " +
    "zero overlap keeps Chapman defined and voids LP") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 2L, 3L, 4L).toDF("id")
    val b = Seq(3L, 4L, 5L, 6L, 7L, 8L).toDF("id")
    val r = DistStats.captureRecapture(a, b, "id").head()
    assert(r.getAs[Long]("n_caught_a") == 4L)
    assert(r.getAs[Long]("n_caught_b") == 6L)
    assert(r.getAs[Long]("n_both") == 2L)
    assert(r.getAs[Double]("lincoln_petersen") == 12.0)
    assert(r.getAs[Double]("chapman") == 10.67) // 5*7/3 - 1
    val disj = DistStats.captureRecapture(a,
      Seq(9L, 10L).toDF("id"), "id").head()
    assert(disj.isNullAt(disj.fieldIndex("lincoln_petersen")))
    assert(disj.getAs[Double]("chapman") == 14.0) // 5*3/1 - 1
    // duplicate catches count once (distinct semantics)
    val dup = DistStats.captureRecapture(
      Seq(1L, 1L, 2L).toDF("id"), Seq(1L).toDF("id"), "id").head()
    assert(dup.getAs[Long]("n_caught_a") == 2L)
    assert(dup.getAs[Long]("n_both") == 1L)
  }

  test("dataMap: constant-high is easy, constant-low hard, " +
    "oscillating ambiguous; population std from exact sums") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(4)(("hi", 0.9)) ++ Seq.fill(4)(("lo", 0.2)) ++
      Seq(("osc", 0.0), ("osc", 1.0), ("osc", 0.0), ("osc", 1.0)))
      .toDF("ex", "sc")
    val m = Cartography.dataMap(df, "ex", col("sc"))
      .collect().map(r => r.getAs[String]("ex") ->
        (r.getAs[Double]("confidence"), r.getAs[Double]("variability"),
          r.getAs[String]("region"))).toMap
    assert(m("hi") == ((0.9, 0.0, "easy_to_learn")))
    assert(m("lo") == ((0.2, 0.0, "hard_to_learn")))
    assert(m("osc") == ((0.5, 0.5, "ambiguous")))
  }

  test("hashFeatures: same token always lands in the same signed " +
    "bucket; weights are exact signed tf sums within range") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha"))
      .toDF("id", "text")
    val r = FeatureHash.hashFeatures(df, "id", Dedup.tokens(col("text")),
      buckets = 16).collect()
    val byDoc = r.groupBy(_.getAs[Long]("id"))
    // doc 1 has alpha x2 + beta; doc 2 alpha x1 — alpha's bucket and
    // sign are identical across docs, so doc1's alpha weight is
    // exactly 2x doc2's
    val d2 = byDoc(2L)
    assert(d2.length == 1)
    val aBucket = d2.head.getAs[Long]("bucket")
    val aw = d2.head.getAs[Long]("weight")
    assert(math.abs(aw) == 1L)
    val d1a = byDoc(1L).find(_.getAs[Long]("bucket") == aBucket)
    // beta could collide with alpha's bucket; weight is then 2a+b
    val d1TokensInA = d1a.get.getAs[Long]("n_tokens")
    if (d1TokensInA == 2L)
      assert(d1a.get.getAs[Long]("weight") == 2L * aw)
    assert(r.forall { x =>
      val b = x.getAs[Long]("bucket")
      b >= 0L && b < 16L &&
        math.abs(x.getAs[Long]("weight")) <= x.getAs[Long]("n_tokens")
    })
    // total token mass preserved across buckets
    assert(r.map(_.getAs[Long]("n_tokens")).sum == 4L)
  }

  test("jlProject: a basis vector projects to ±1/sqrt(k) everywhere, " +
    "and the projection is exactly linear on 6-dp inputs") {
    val s = spark
    import s.implicits._
    val e1 = Seq((1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(2.0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.jlProject(e1, "vec_id", "embedding",
      k = 4, dims = 4).collect()
    val v1 = r.filter(_.getAs[Long]("vec_id") == 1L)
      .map(x => x.getAs[Long]("dim") -> x.getAs[Double]("component"))
      .toMap
    val v2 = r.filter(_.getAs[Long]("vec_id") == 2L)
      .map(x => x.getAs[Long]("dim") -> x.getAs[Double]("component"))
      .toMap
    assert(v1.size == 4)
    v1.values.foreach(c => assert(math.abs(math.abs(c) - 0.5) < 1e-9,
      s"|c| != 1/sqrt(4): $c"))
    // linearity: doubling the input doubles every component
    (0L until 4L).foreach(j => assert(v2(j) == 2.0 * v1(j)))
  }
}
