package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 19: X179 trimmed mean, X180 KS test. */
class KsTrimSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("ksTest: identical samples 0, disjoint samples 1, " +
    "hand-computed interleaved case") {
    val s = spark
    import s.implicits._
    def ks(rows: Seq[(Long, Boolean)]): Double =
      Hypothesis.ksTest(rows.toDF("v", "g"), "v", $"g")
        .head().getAs[Double]("ks_d")
    val base = Seq(1L, 2L, 3L, 4L)
    assert(ks(base.map((_, true)) ++ base.map((_, false))) == 0.0)
    assert(ks(Seq(1L, 2L).map((_, true)) ++
      Seq(10L, 20L).map((_, false))) == 1.0)
    // A = {1, 3}, B = {2, 4}: CDF gaps at v=1 (1/2-0), v=2 (1/2-1/2),
    // v=3 (1-1/2) -> D = 0.5
    assert(ks(Seq((1L, true), (3L, true), (2L, false), (4L, false)))
      == 0.5)
    // shifted same-shape distributions -> D = shift overlap fraction
    val a = (1L to 100L).map((_, true))
    val b = (51L to 150L).map((_, false))
    assert(ks(a ++ b) == 0.5)
  }

  test("ksTest sees fractional [0,1] scores exactly (micro-unit " +
    "quantization — a bare long cast would collapse them to one step)") {
    val s = spark
    import s.implicits._
    // A = {0.1, 0.3}, B = {0.2, 0.4}: same shape as the integer
    // interleaved case above -> D = 0.5, not the 0.0 a truncating
    // cast-to-long would report
    val d = Hypothesis.ksTest(
      Seq((0.1, true), (0.3, true), (0.2, false), (0.4, false))
        .toDF("v", "g"), "v", $"g")
      .head().getAs[Double]("ks_d")
    assert(d == 0.5)
    // disjoint score ranges -> D = 1
    val d1 = Hypothesis.ksTest(
      Seq((0.01, true), (0.02, true), (0.9, false), (0.95, false))
        .toDF("v", "g"), "v", $"g")
      .head().getAs[Double]("ks_d")
    assert(d1 == 1.0)
  }

  test("trimmedMean drops exactly the outside-order-statistic " +
    "values; outliers stop moving the mean") {
    val s = spark
    import s.implicits._
    // g: 1..10 -> lo = ceil(.1*10)=1st smallest = 1, hi = 9th = 9;
    // kept 1..9, mean 5; an outlier 1000 at the same size-11 group:
    // lo = ceil(1.1)=2nd = 2? recompute: n=11, lo rank ceil(1.1)=2
    // -> 2, hi rank ceil(9.9)=10 -> 10; kept 2..10, mean 6
    val clean = (1L to 10L).map(v => ("g", v))
    val out = CorpusOps.trimmedMean(clean.toDF("g", "v"), "g", "v")
      .head()
    assert(out.getAs[Long]("trim_lo") == 1L)
    assert(out.getAs[Long]("trim_hi") == 9L)
    assert(out.getAs[Long]("n_kept") == 9L)
    assert(out.getAs[Double]("trimmed_mean") == 5.0)
    val spiked = clean :+ (("g", 1000L))
    val r = CorpusOps.trimmedMean(spiked.toDF("g", "v"), "g", "v")
      .head()
    assert(r.getAs[Long]("trim_hi") == 10L)
    assert(r.getAs[Long]("n_kept") == 9L) // 2..10, the spike trimmed
    assert(r.getAs[Double]("trimmed_mean") == 6.0)
  }
}
