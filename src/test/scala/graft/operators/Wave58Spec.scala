package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Wave 58 (X417–X419): Pettitt change-point (decile lift and
  * Storey q-values are inline queries verified by their hash
  * oracles).
  */
class Wave58Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  private def key(i: Int) = f"t$i%03d"

  test("pettitt: a level shift is located at the true cut with " +
    "K = n1*n2; a flat series reads K = 0, p capped at 1") {
    val shift = (1 to 15).map(i => (key(i), 100L)) ++
      (16 to 30).map(i => (key(i), 200L))
    val r = TimeSeries.pettitt(shift.toDF("o", "v"), "o", "v")
      .collect()(0)
    assert(r.getAs[Long]("k_stat") == 225) // 15 * 15
    assert(r.getAs[Long]("break_pos") == 15)
    assert(r.getAs[String]("break_after") == key(15))
    assert(r.getAs[Double]("p_approx") < 0.01)
    val flat = (1 to 20).map(i => (key(i), 7L))
    val rf = TimeSeries.pettitt(flat.toDF("o", "v"), "o", "v")
      .collect()(0)
    assert(rf.getAs[Long]("k_stat") == 0)
    assert(rf.getAs[Double]("p_approx") == 1.0)
  }

  test("pettitt: earliest maximizing cut wins the tiebreak") {
    // symmetric two-sided bump: several cuts tie at max |U|
    val vals = Seq(1L, 1L, 5L, 5L, 1L, 1L).zipWithIndex.map {
      case (v, i) => (key(i + 1), v)
    }
    val r = TimeSeries.pettitt(vals.toDF("o", "v"), "o", "v")
      .collect()(0)
    // the reported position is the FIRST cut reaching the max
    assert(r.getAs[Long]("break_pos") <=
      vals.length / 2)
  }
}