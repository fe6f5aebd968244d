package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Quantiles.exactQuantile: rank-definition equality against a local
  * sort across random multisets, boundary quantiles, and degenerate
  * inputs.
  */
class QuantilesSpec extends AnyFunSuite with graft.PropertyHarness {
  private lazy val spark = SparkHarness.spark

  private def lowerQuantile(sorted: Seq[Long], q: Double): Long =
    sorted(math.max(math.ceil(q * sorted.size).toInt, 1) - 1)

  test("matches the local sorted definition on random multisets") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
    forAllSampled(gen, n = 15) { vals =>
      val df = vals.toDF("v").repartition(4)
      val sorted = vals.sorted
      for (q <- Seq(0.01, 0.5, 0.9, 1.0)) {
        val got = Quantiles.exactQuantile(df, "v", q)
        assert(got == lowerQuantile(sorted, q),
          s"q=$q vals=${sorted.take(20)}...")
      }
    }
  }

  test("single value, duplicates, and full-range extremes") {
    val s = spark
    import s.implicits._
    assert(Quantiles.exactQuantile(Seq(7L).toDF("v"), "v", 0.5) == 7L)
    val dup = Seq.fill(100)(5L) ++ Seq.fill(1)(9L)
    assert(Quantiles.exactQuantile(dup.toDF("v"), "v", 0.5) == 5L)
    assert(Quantiles.exactQuantile(dup.toDF("v"), "v", 1.0) == 9L)
    val wide = Seq(Long.MinValue / 2, 0L, Long.MaxValue / 2)
    assert(Quantiles.exactQuantile(wide.toDF("v"), "v", 0.5) == 0L)
    // windows ending at Long.MaxValue: lo + width − 1 used to wrap
    // negative (hi < lo), exiting the loop unconverged with a wrong
    // answer — the BigInt clamp keeps hi pinned at the true window end
    val top = Seq(10L, Long.MaxValue - 1, Long.MaxValue)
    assert(Quantiles.exactQuantile(top.toDF("v"), "v", 1.0)
      == Long.MaxValue)
    assert(Quantiles.exactQuantile(top.toDF("v"), "v", 0.6)
      == Long.MaxValue - 1)
    val gTop = Seq(("g", 10L), ("g", Long.MaxValue)).toDF("g", "v")
    assert(Quantiles.exactQuantileByGroup(gTop, "g", "v", 1.0)
      .collect().head.getLong(1) == Long.MaxValue)
  }

  test("grouped: every group matches its own local sorted definition") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    val gen = Gen.listOfN(200, Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(-500L, 500L)))
    forAllSampled(gen, n = 8) { rows =>
      val df = rows.toDF("g", "v").repartition(4)
      for (q <- Seq(0.25, 0.5, 0.95)) {
        val got = Quantiles.exactQuantileByGroup(df, "g", "v", q)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val want = rows.groupBy(_._1).map { case (g, xs) =>
          g -> lowerQuantile(xs.map(_._2).sorted, q)
        }
        assert(got == want, s"q=$q")
      }
    }
    // groups of very different ranges converge independently
    val mixed = (Seq.fill(50)(("narrow", 5L)) ++
      (0 until 50).map(i => ("wide", i * 1000000L))).toDF("g", "v")
    val m = Quantiles.exactQuantileByGroup(mixed, "g", "v", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("narrow") == 5L && m("wide") == 24000000L, m.toString)
  }

  test("empty input rejected loudly") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      Quantiles.exactQuantile(Seq.empty[Long].toDF("v"), "v", 0.5)
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("madOutliers: hand medians/MADs, MAD-0 group flags any deviation") {
    val s = spark
    import s.implicits._
    // a: values 1,2,3,100 → med 2 (lower median), devs {1,0,1,98} →
    //    mad 1 → only 100 (98 > 3·1) flags
    // b: 5,5,9 → med 5, devs {0,0,4} → mad 0 → 9 flags (4 > 0), the
    //    documented MAD-0 convention
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 100L),
      (5L, "b", 5L), (6L, "b", 5L), (7L, "b", 9L)
    ).toDF("id", "g", "v")
    val got = Quantiles.madOutliers(df, "id", "g", "v", c = 3L)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, false), (2L, 2L, 1L, false), (3L, 2L, 1L, false),
      (4L, 2L, 1L, true),
      (5L, 5L, 0L, false), (6L, 5L, 0L, false), (7L, 5L, 0L, true)))
  }

  test("madOutliers: null group key kept (null-safe stat joins)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Option("a"), 1L), (2L, Option("a"), 2L),
      (3L, Option.empty[String], 10L), (4L, Option.empty[String], 10L),
      (5L, Option.empty[String], 500L)
    ).toDF("id", "g", "v")
    val got = Quantiles.madOutliers(df, "id", "g", "v", c = 3L)
      .orderBy($"id").collect()
    assert(got.length == 5, "null-group rows must survive the joins")
    // null group: med 10, devs {0,0,490} → mad 0 → 500 flags
    val nullRows = got.filter(_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toSeq
    assert(nullRows == Seq(
      (3L, 10L, 0L, false), (4L, 10L, 0L, false), (5L, 10L, 0L, true)))
  }
}
