package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 15: X241 EB shrinkage, X242 interrupted time series,
  * X243 risk-coverage curve, X244 KMV bottom-k sketch.
  */
class Wave15Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("ebShrink: spread slices shrink toward the prior mean by " +
    "hand; zero between-slice variance disables shrinkage loudly") {
    val s = spark
    import s.implicits._
    // rates .5 (4/8), .25 (1/4), .75 (3/4): m=.5, v=1/24, s=5
    val rows =
      (1 to 8).map(i => ("s1", i <= 4)) ++
        (1 to 4).map(i => ("s2", i <= 1)) ++
        (1 to 4).map(i => ("s3", i <= 3))
    val r = DistStats.ebShrink(rows.toDF("src", "y"), "src", col("y"))
      .collect().map(x => x.getAs[String]("src") ->
        (x.getAs[Double]("raw_rate"), x.getAs[Double]("shrunk_rate"),
          x.getAs[Double]("prior_strength"))).toMap
    assert(r("s1") == ((0.5, 0.5, 5.0)))
    assert(r("s2") == ((0.25, 0.388889, 5.0))) // (1+2.5)/9
    assert(r("s3") == ((0.75, 0.611111, 5.0))) // (3+2.5)/9
    // every shrunk rate sits strictly between raw and prior mean
    assert(math.abs(r("s2")._2 - 0.5) < math.abs(0.25 - 0.5))
    // identical rates: v = 0 -> raw passthrough, NULL strength
    val flat = (Seq.fill(4)(("a", true)) ++ Seq.fill(4)(("a", false)) ++
      Seq.fill(2)(("b", true)) ++ Seq.fill(2)(("b", false)))
      .toDF("src", "y")
    val f = DistStats.ebShrink(flat, "src", col("y")).collect()
    assert(f.forall(_.getAs[Double]("shrunk_rate") == 0.5))
    assert(f.forall(_.isNullAt(f.head.fieldIndex("prior_strength"))))
  }

  test("interruptedSeries: hand two-segment line — level change 6, " +
    "slope change 0; a one-day segment voids its fit only") {
    val s = spark
    import s.implicits._
    val daily = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("A", 4L, 10.0), ("A", 5L, 11.0), ("A", 6L, 12.0))
      .toDF("k", "t", "y")
    val r = TimeSeries.interruptedSeries(daily, "k", "t", "y",
      breakAt = 4L).head()
    assert(r.getAs[Double]("slope_pre") == 1.0)
    assert(r.getAs[Double]("intercept_pre") == 0.0)
    assert(r.getAs[Double]("slope_post") == 1.0)
    assert(r.getAs[Double]("intercept_post") == 6.0)
    assert(r.getAs[Double]("level_change") == 6.0)
    assert(r.getAs[Double]("slope_change") == 0.0)
    val short = Seq(("B", 1L, 1.0), ("B", 2L, 2.0), ("B", 5L, 9.0))
      .toDF("k", "t", "y")
    val h = TimeSeries.interruptedSeries(short, "k", "t", "y",
      breakAt = 4L).head()
    assert(h.getAs[Double]("slope_pre") == 1.0)
    assert(h.isNullAt(h.fieldIndex("slope_post")))
    assert(h.isNullAt(h.fieldIndex("level_change")))
  }

  test("riskCoverage: hand 3-step curve — coverage monotone, risk " +
    "tracks the errors admitted at each cut") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, false), (2L, true), (1L, false)).toDF("s", "e")
    val r = RankEval.riskCoverage(df, "s", col("e"))
      .orderBy(col("threshold").desc).collect()
    assert(r.map(_.getAs[Double]("coverage")).toSeq ==
      Seq(0.333333, 0.666667, 1.0))
    assert(r.map(_.getAs[Double]("risk")).toSeq ==
      Seq(0.0, 0.5, 0.333333))
    assert(r.map(_.getAs[Long]("n_covered")).toSeq == Seq(1L, 2L, 3L))
  }

  test("Kmv: below-k sketches are exact sets — estimates, union, " +
    "jaccard and intersection all recover the truth") {
    val s = spark
    import s.implicits._
    // A = 1..20, B = 11..30: below k=32 everything is exact
    val df = ((1 to 20).map(i => ("a", i.toLong)) ++
      (11 to 30).map(i => ("b", i.toLong))).toDF("g", "k")
    val sk = Kmv.sketch(df, "g", "k", k = 32)
    val est = Kmv.estimate(sk, "g", k = 32).collect()
      .map(x => x.getAs[String]("g") ->
        x.getAs[Double]("est_distinct")).toMap
    assert(est("a") == 20.0 && est("b") == 20.0)
    val ops = Kmv.setOps(sk, "g", k = 32).head()
    assert(ops.getAs[Double]("est_union") == 30.0)
    assert(ops.getAs[Long]("shared_in_bottomk") == 10L)
    assert(ops.getAs[Double]("jaccard_est") == 0.333333)
    assert(ops.getAs[Double]("est_intersect") == 10.0)
    // at n > k the estimate is within ~3/sqrt(k) of truth for this
    // fixed salt (deterministic, so this is a pinned regression)
    val big = (1 to 500).map(i => ("c", i.toLong)).toDF("g", "k")
    val bigEst = Kmv.estimate(Kmv.sketch(big, "g", "k", k = 64),
      "g", k = 64).head().getAs[Double]("est_distinct")
    assert(bigEst > 300 && bigEst < 800, s"KMV estimate off: $bigEst")
  }
}
