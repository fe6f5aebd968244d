package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 8: X212 conformal thresholds, X213 Kaplan-Meier, X214
  * temporal coverage.
  */
class Wave8Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("conformalThreshold: k = ceil(0.9(n+1)) order statistic; " +
    "too-small groups answer NULL") {
    val s = spark
    import s.implicits._
    // g9: scores 1..9, n=9 -> k = ceil(0.9*10) = 9 -> threshold 9
    // g19: 1..19 -> k = 18 -> threshold 18
    // g3: 1..3 -> k = ceil(0.9*4) = 4 > n -> NULL
    val df = ((1 to 9).map(i => ("g9", i.toDouble)) ++
      (1 to 19).map(i => ("g19", i.toDouble)) ++
      (1 to 3).map(i => ("g3", i.toDouble))).toDF("g", "sc")
    val out = Quantiles.conformalThreshold(df, "g", "sc").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"),
          Option(r.getAs[java.lang.Double]("threshold"))
            .map(_.doubleValue))).toMap
    assert(out("g9") == (9L, 9L, Some(9.0)))
    assert(out("g19") == (19L, 18L, Some(18.0)))
    assert(out("g3") == (3L, 4L, None))
  }

  test("kaplanMeier: the textbook censored ladder and the " +
    "everyone-dies boundary (no ln(0))") {
    val s = spark
    import s.implicits._
    // durations 1, 2+, 3, 4+, 5 (+ = censored)
    val subj = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true)).toDF("dur", "ev")
    val out = Funnel.kaplanMeier(subj, "dur", $"ev")
      .orderBy("t").collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("d"),
          r.getAs[Double]("survival")))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 5L))
    val m = out.toMap
    assert(m(1L) == (5L, 1L, 0.8))
    assert(m(3L)._1 == 3L && math.abs(m(3L)._3 - 0.533333) < 1e-6)
    assert(m(5L) == (1L, 1L, 0.0))
    // d == n_risk at the only event time -> survival exactly 0
    val all = Seq((2L, true), (2L, true)).toDF("dur", "ev")
    val r2 = Funnel.kaplanMeier(all, "dur", $"ev").head()
    assert(r2.getAs[Double]("survival") == 0.0)
  }

  test("coverageReport: span/density/max-gap hand case") {
    val s = spark
    import s.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"2024-01-0$d")
    val ev = Seq(("k", t("1 10:00:00")), ("k", t("1 23:00:00")),
      ("k", t("2 01:00:00")), ("k", t("5 09:00:00")))
      .toDF("g", "ts")
    val r = TimeSeries.coverageReport(ev, "g", "ts").head()
    assert(r.getAs[Long]("span_days") == 5L)
    assert(r.getAs[Long]("days_present") == 3L)
    assert(r.getAs[Double]("coverage") == 0.6)
    assert(r.getAs[Long]("max_gap_days") == 2L)
  }
}
