package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Constraint-suite semantics: metrics, verdicts at thresholds, the
  * empty-table and duplicate-name conventions.
  */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("check: metrics and verdicts on a hand-built table") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a"), 5), (2L, Some("b"), 50), (3L, None, 500),
      (3L, Some("d"), 5000)
    ).toDF("id", "t", "v")
    val got = Constraints.check(df, Seq(
        Constraints.Unique("id_unique", "id"),            // 3/4
        Constraints.Complete("t_complete", "t", 0.7),     // 3/4 ≥ 0.7
        Constraints.Satisfies("v_range", $"v" <= 500, 0.5) // 3/4? v<=500: 5,50,500 → 3/4
      ))
      .orderBy($"check_name")
      .as[(String, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("id_unique", 0.75, 1.0, false),
      ("t_complete", 0.75, 0.7, true),
      ("v_range", 0.75, 0.5, true)))
  }

  test("check: empty table vacuously passes; duplicate names rejected") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    val got = Constraints.check(empty, Seq(
        Constraints.Unique("u", "id")))
      .as[(String, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(("u", 1.0, 1.0, true)))
    intercept[IllegalArgumentException] {
      Constraints.check(empty, Seq(
        Constraints.Unique("u", "id"), Constraints.Complete("u", "t")))
    }
  }
}
