package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 34: X312 KLL quantile sketches, X313 two-group bootstrap
  * diff CI, X314 quantile treatment effects, X315 Page-Hinkley.
  */
class Wave34Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("kll groupQuantiles: exact n per group; quantile estimates " +
    "within KLL rank tolerance of the exact order statistics " +
    "across partitions (the merge path)") {
    val s = spark
    import s.implicits._
    // 10k uniform values per group, deliberately multi-partition so
    // stage-2 merging is exercised
    val df = (1 to 10000).flatMap(i =>
      Seq(("g1", i.toDouble), ("g2", (i * 2).toDouble)))
      .toDF("g", "v").repartition(8)
    val r = Kll.groupQuantiles(df, "g", "v", k = 200,
        qs = Seq(0.5, 0.9, 0.99))
      .collect().map(x => x.getAs[String]("group") -> x).toMap
    assert(r("g1").getAs[Long]("n") == 10000L)
    // k=200 => ~1.65% rank error at 99% confidence; allow 3%
    def ok(est: Double, trueV: Double, span: Double) =
      math.abs(est - trueV) <= 0.03 * span
    assert(ok(r("g1").getAs[Double]("p50"), 5000, 10000))
    assert(ok(r("g1").getAs[Double]("p90"), 9000, 10000))
    assert(ok(r("g1").getAs[Double]("p99"), 9900, 10000))
    assert(ok(r("g2").getAs[Double]("p50"), 10000, 20000))
  }

  test("diffBootstrapCI: a real gap puts the point estimate inside " +
    "a band excluding zero; identical groups straddle zero") {
    val s = spark
    import s.implicits._
    val gap = ((1 to 200).map(i => (i.toLong, 100.0 + (i % 10), true))
      ++ (1 to 200).map(i => (1000L + i, 50.0 + (i % 10), false)))
      .toDF("id", "v", "a")
    val r = CorpusOps.diffBootstrapCI(gap, "id", "v", col("a"))
      .head()
    assert(r.getAs[Long]("n_a") == 200L)
    assert(r.getAs[Double]("point_diff") == 50.0)
    assert(r.getAs[Double]("ci_lo") > 45.0)
    assert(r.getAs[Double]("ci_hi") < 55.0)
    assert(r.getAs[Long]("n_replicates") == 64L)
    val same = ((1 to 200).map(i => (i.toLong, (i % 7).toDouble, true))
      ++ (1 to 200).map(i => (1000L + i, (i % 7).toDouble, false)))
      .toDF("id", "v", "a")
    val z = CorpusOps.diffBootstrapCI(same, "id", "v", col("a"))
      .head()
    assert(z.getAs[Double]("ci_lo") < 0.0 &&
      z.getAs[Double]("ci_hi") > 0.0)
  }

  test("quantileTreatmentEffect: a pure tail intervention shows " +
    "zero median QTE but a large p90 QTE — the mean-hiding case") {
    val s = spark
    import s.implicits._
    // B: 1..100; A: same but the top 15 values shifted +1000 (the
    // rank-90 order statistic lands inside the shifted region)
    val a = (1 to 85).map(i => (i.toLong, true)) ++
      (86 to 100).map(i => (i + 1000L, true))
    val b = (1 to 100).map(i => (i.toLong, false))
    val df = (a ++ b).toDF("v", "isa")
    val r = Quantiles.quantileTreatmentEffect(df, "v", col("isa"),
        qs = Seq(0.5, 0.9))
      .collect().map(x => x.getAs[Double]("q") -> x).toMap
    assert(r(0.5).getAs[Long]("qte") == 0L)
    assert(r(0.9).getAs[Long]("qte") == 1000L)
    assert(r(0.5).getAs[Long]("quantile_a") == 50L)
  }

  test("pageHinkley: a level step trips the excursion at the step " +
    "and alarms past lambda; a flat series stays at zero") {
    val s = spark
    import s.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("o", "v")
    val stepped = series(Seq.fill(10)(100L) ++ Seq.fill(10)(200L))
    val r = TimeSeries.pageHinkley(stepped, "o", "v", delta = 0.0,
      lambda = 100.0).head()
    assert(r.getAs[Boolean]("alarm"))
    assert(r.getAs[Int]("ph_max_at") == 20) // excursion peaks at the end
    assert(r.getAs[Double]("ph_max") > 400.0)
    val flat = series(Seq.fill(10)(100L))
    val f = TimeSeries.pageHinkley(flat, "o", "v", delta = 0.0,
      lambda = 100.0).head()
    assert(f.getAs[Double]("ph_max") == 0.0)
    assert(!f.getAs[Boolean]("alarm"))
  }
}
