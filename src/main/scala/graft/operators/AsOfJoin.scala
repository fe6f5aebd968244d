package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * right.ts <= left.ts within the same key (SURVEY.md §2.3 "not
  * present in reference; engine exposes it"). Spark has no built-in
  * as-of join; the scalable formulation is union + one window pass:
  * tag both sides, sort by (key, ts, side), and carry the last seen
  * right payload forward with `last(_, ignoreNulls)`.
  *
  * One shuffle total (the window partitioning) regardless of input
  * sizes — compare a naive range join (quadratic candidate space) or
  * per-key mapGroups (skew-prone). Ties (equal ts): the right row
  * sorts BEFORE the left row (side flag), so an exactly-simultaneous
  * right row IS visible to the left row, matching DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics.
  */
object AsOfJoin {

  /** `left` and `right` must share `keyCol` and `tsCol`. The result
    * keeps all left rows and columns plus `payloadCols` from the
    * right side (null when no prior right row exists).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__p_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.map(c =>
          last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
