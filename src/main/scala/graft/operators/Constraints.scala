package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ shape):
  * a suite of table expectations — uniqueness, completeness, ranges,
  * allowed values, arbitrary predicates — evaluated in as few passes
  * as the constraint mix allows, reporting one row per constraint
  * with its measured metric and verdict.
  *
  * The promote/reject gate every production corpus snapshot passes
  * before training sees it; [[graft.functions.QualityMetrics]] rides
  * an existing action for free counters, this operator is the
  * standalone audit with thresholds and verdicts.
  *
  * Scale shape: every row-level constraint compiles to one
  * conditional aggregate over a SINGLE shared scan (one job, map-side
  * combined); each uniqueness constraint adds one distinct-count over
  * its column (the unavoidable shuffle, one per such constraint).
  * Nothing is row-materialized; the report is constraint-sized.
  */
object Constraints {

  sealed trait Check {
    def name: String
  }
  /** metric = fraction of rows where `pred` holds; passes when
    * metric ≥ `minFraction`.
    */
  final case class Satisfies(name: String, pred: Column,
      minFraction: Double) extends Check
  /** metric = fraction of non-null rows; passes at ≥ `minFraction`. */
  final case class Complete(name: String, col: String,
      minFraction: Double = 1.0) extends Check
  /** metric = distinct/total; passes when every value is unique. */
  final case class Unique(name: String, col: String) extends Check

  /** Evaluate the suite. Output: (check_name, metric, threshold,
    * passed), one row per check, in suite order — metric is the
    * measured fraction rounded to 6 dp half-up (engine-exact: integer
    * counts, one division, the same rounding as SQL `round`), and
    * `passed` compares the ROUNDED metric so both engines verdict
    * identically.
    */
  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty constraint suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "constraint names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val rowAggs = count(lit(1)).as("__n") +: checks.collect {
      case Satisfies(n, pred, _) =>
        count(when(pred, 1)).as(s"__c_$n")
      case Complete(n, c, _) =>
        count(col(c)).as(s"__c_$n")
      case Unique(n, c) =>
        count_distinct(col(c)).as(s"__c_$n")
    }
    val row = df.agg(rowAggs.head, rowAggs.tail: _*).head()
    val n = row.getLong(0)
    val report = checks.zipWithIndex.map { case (c, i) =>
      val cnt = row.getLong(i + 1)
      val metric =
        if (n == 0) 1.0
        else math.floor(cnt.toDouble / n * 1e6 + 0.5) / 1e6
      val threshold = c match {
        case Satisfies(_, _, f) => f
        case Complete(_, _, f) => f
        case Unique(_, _) => 1.0
      }
      (c.name, metric, threshold, metric >= threshold)
    }
    spark.createDataFrame(report)
      .toDF("check_name", "metric", "threshold", "passed")
  }

  /** X208 — functional-dependency scan: for each candidate pair
    * (determinant → dependent), the violation rate
    * 1 − Σ_a max_b count(a,b) / N — 0 iff the determinant uniquely
    * fixes the dependent (the FD holds), and otherwise "how close" —
    * the schema-semantics check beside [[check]]'s row predicates
    * (Unique is the special case det → whole-row). Exact integer
    * cells per pair ((\|A\|·\|B\|)-bounded), one double ratio.
    * Output one row per pair in declaration order.
    */
  def fdScan(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "empty FD pair list")
    pairs.map { case (det, dep) =>
      val cells = df.groupBy(col(det).cast("string").as("__a"),
          col(dep).cast("string").as("__b"))
        .agg(count(lit(1)).as("__c"))
      val best = cells.groupBy(col("__a"))
        .agg(max(col("__c")).as("__m"), sum(col("__c")).as("__t"))
      best.agg(count(lit(1)).cast("long").as("n_groups"),
          coalesce(sum(col("__t")), lit(0L)).cast("long").as("__n"),
          coalesce(sum(col("__m")), lit(0L)).cast("long").as("__keep"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_groups"),
          when(col("__n") > 0L,
            round((col("__n") - col("__keep")).cast("double") /
              col("__n"), 6)).otherwise(lit(0.0))
            .as("violation_rate"),
          (col("__n") === col("__keep")).as("holds"))
    }.reduce(_ unionByName _)
  }
}
