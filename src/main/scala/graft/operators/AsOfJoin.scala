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
    * right side (null when no matching right row exists).
    *
    * `direction`: "backward" (default — latest right with
    * right.ts <= left.ts) or "forward" (earliest right with
    * right.ts >= left.ts); both match DuckDB `ASOF JOIN` with
    * `l.ts >= r.ts` / `l.ts <= r.ts` respectively, including the
    * equal-ts case. `tolerance`: maximum |left.ts − right.ts| for a
    * match — in MICROSECONDS for timestamp columns, in the column's
    * own units otherwise; farther matches become nulls (pandas
    * `merge_asof(tolerance=...)` semantics). Still one shuffle: the
    * tolerance check reuses the matched ts carried through the same
    * window.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns
    val rts = "__p___rts" // matched right ts rides along as a payload
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__p_$c")) :+
        lit(null).cast(right.schema(tsCol).dataType).as(rts): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")) :+
        col(tsCol).as(rts): _*)
    // right rows sort before left rows at equal ts in TRAVERSAL order
    // (asc for backward, desc for forward), so a simultaneous right
    // row is visible in both directions
    val w = Window.partitionBy(col(keyCol))
      .orderBy(
        (if (direction == "backward") col(tsCol).asc else col(tsCol).desc),
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        (payloadCols :+ rts).map(c =>
          last(col(s"__p_${c.stripPrefix("__p_")}"), ignoreNulls = true)
            .over(w).as(c.stripPrefix("__p_"))): _*)
      .filter(col("__side") === 1)
      .drop("__side")
    val matched = col(rts.stripPrefix("__p_"))
    val result = tolerance match {
      case None => joined
      case Some(t) =>
        val isTs = right.schema(tsCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.TimestampType]
        def micros(c: Column) = if (isTs) unix_micros(c) else c
        val dist =
          if (direction == "backward") micros(col(tsCol)) - micros(matched)
          else micros(matched) - micros(col(tsCol))
        payloadCols.foldLeft(joined) { (df, c) =>
          df.withColumn(c, when(matched.isNotNull && dist <= t, col(c)))
        }
    }
    result.drop(rts.stripPrefix("__p_"))
  }
}
