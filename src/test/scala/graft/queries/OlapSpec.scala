package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** The approximate quantile sketch must track its exact twin — the
  * error-bound guard that lets the rows-only driver check suffice
  * (same structure as the HLL vs countDistinct spec).
  */
class OlapSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx quantiles within tolerance of exact per group") {
    val exact = OlapQueries.defs.find(_.name == "q_value_quantiles").get
      .build(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val approx = OlapQueries.defs.find(_.name == "q_approx_quantiles").get
      .build(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      // accuracy=1000 → rank error ≤ 1/1000; values here span ~[0,1e3],
      // so a loose relative/absolute mixed bound is ample
      assert(math.abs(a50 - p50) <= math.max(2.0, p50 * 0.1),
        s"$k p50 exact=$p50 approx=$a50")
      assert(math.abs(a95 - p95) <= math.max(5.0, p95 * 0.1),
        s"$k p95 exact=$p95 approx=$a95")
    }
  }
}
