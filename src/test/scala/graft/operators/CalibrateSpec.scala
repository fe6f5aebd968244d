package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 3: X191 quantile normalization, X192 isotonic fit. */
class CalibrateSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("quantileNormalize: shifted groups land on identical pooled " +
    "values; a lone group maps onto itself") {
    val s = spark
    import s.implicits._
    // A = [1..4], B = [11..14]: same within-group shape -> same
    // normalized sequence [1, 3, 11, 13] for both
    val df = (Seq(1L, 2L, 3L, 4L).zipWithIndex.map { case (v, i) =>
      ("A", i.toLong, v) } ++
      Seq(11L, 12L, 13L, 14L).zipWithIndex.map { case (v, i) =>
        ("B", 10L + i, v) }).toDF("g", "id", "v")
    val out = Calibrate.quantileNormalize(df, "g", "v", "id")
      .orderBy("g", "id").collect()
    val a = out.filter(_.getString(0) == "A")
      .map(_.getAs[Double]("norm_value")).toSeq
    val b = out.filter(_.getString(0) == "B")
      .map(_.getAs[Double]("norm_value")).toSeq
    assert(a == Seq(1.0, 3.0, 11.0, 13.0))
    assert(a == b, "equal within-group ranks must normalize equally")
    // single group: normalization is the identity on its own values
    val solo = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("g", 4L, 40L)).toDF("g", "id", "v")
    Calibrate.quantileNormalize(solo, "g", "v", "id").collect()
      .foreach { r =>
        assert(r.getAs[Double]("norm_value") == r.getAs[Double]("value"))
      }
  }

  test("isotonicFit: monotone input passes through; a violating " +
    "pair pools to its weighted average; output is non-decreasing") {
    val s = spark
    import s.implicits._
    def mk(rows: Seq[(Double, Boolean)]) = rows.toDF("score", "y")
    // two bins, rates 0.8 then 0.2 -> both pool to 0.5
    val viol = mk(
      Seq.fill(4)((0.0, true)) ++ Seq.fill(1)((0.0, false)) ++
        Seq.fill(1)((1.0, true)) ++ Seq.fill(4)((1.0, false)))
    val v = Calibrate.isotonicFit(viol, "score", "y", bins = 2)
      .orderBy("bin").collect()
    assert(v.map(_.getAs[Double]("fitted")).toSeq == Seq(0.5, 0.5))
    assert(v.map(_.getAs[Double]("raw_rate")).toSeq == Seq(0.8, 0.2))
    // already-monotone rates are untouched
    val mono = mk(
      Seq.fill(1)((0.0, true)) ++ Seq.fill(4)((0.0, false)) ++
        Seq.fill(4)((1.0, true)) ++ Seq.fill(1)((1.0, false)))
    val m = Calibrate.isotonicFit(mono, "score", "y", bins = 2)
      .orderBy("bin").collect()
    assert(m.map(_.getAs[Double]("fitted")).toSeq == Seq(0.2, 0.8))
    // a longer mixed ladder: fitted must be non-decreasing and
    // bounded by the observed rate range
    val mixed = mk(Seq.tabulate(200) { i =>
      val sc = (i % 10).toDouble
      (sc, (i * 7 % 10) < (i % 10)) // noisy but upward-trending
    })
    val f = Calibrate.isotonicFit(mixed, "score", "y", bins = 10)
      .orderBy("bin").collect().map(_.getAs[Double]("fitted")).toSeq
    assert(f.zip(f.tail).forall { case (x, y) => x <= y },
      s"fitted not monotone: $f")
    assert(f.forall(x => x >= 0.0 && x <= 1.0))
  }
}
