package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of join — for each left row, the latest right row with
  * right.ts <= left.ts within the same key (SURVEY.md §2.3 "not
  * present in reference; engine exposes it"). Spark has no built-in
  * as-of join; the scalable formulation is union + one window pass:
  * tag both sides, sort by (key, ts, side), and carry the last seen
  * right row forward with `last(_, ignoreNulls)`.
  *
  * One shuffle total (the window partitioning) regardless of input
  * sizes — compare a naive range join (quadratic candidate space) or
  * per-key mapGroups (skew-prone). Ties (equal ts): the right row
  * sorts BEFORE the left row (side flag), so an exactly-simultaneous
  * right row IS visible to the left row, matching DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics.
  *
  * The entire matched right row (all payloads plus its ts) rides the
  * window as ONE struct, so every output payload comes from the same
  * right row even when individual payload values are null — the
  * pandas `merge_asof` contract (whole matched row, nulls preserved).
  * Filling each payload with its own `last(ignoreNulls)` would
  * instead backfill a null payload from an older right row.
  *
  * [[asOfBucketed]] is the hot-key form: same semantics, window
  * partitioned by (key, time-bucket) so one key's 10⁸ events spread
  * across buckets instead of funneling into one sort task.
  */
object AsOfJoin {

  /** Both sides tagged and unioned; the matched right row travels as
    * one struct (payloads + its ts as `__rts`) in `__p`.
    */
  private def unionTagged(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val otherLeft = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val ptype = StructType(
      payloadCols.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField("__rts", right.schema(tsCol).dataType))
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        otherLeft.map(col) :+
        lit(null).cast(ptype).as("__p"): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col) :+ col(tsCol).as("__rts"): _*)
          .as("__p"): _*)
    l.unionByName(r)
  }

  /** Null the matched struct when its ts is farther than `tolerance`
    * (whole-row semantics), then project left columns + payloads.
    */
  private def gateAndProject(withMatch: DataFrame, leftCols: Seq[String],
      tsCol: String, payloadCols: Seq[String], direction: String,
      tolerance: Option[Long], isTs: Boolean): DataFrame = {
    val gated = tolerance match {
      case None => withMatch
      case Some(t) =>
        def micros(c: Column) = if (isTs) unix_micros(c) else c
        val rts = col("__m").getField("__rts")
        val dist =
          if (direction == "backward") micros(col(tsCol)) - micros(rts)
          else micros(rts) - micros(col(tsCol))
        withMatch.withColumn("__m",
          when(rts.isNotNull && dist <= t, col("__m")))
    }
    gated.select(leftCols.map(col) ++
      payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

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
    * own units otherwise; the WHOLE matched row is nulled when it
    * falls outside tolerance (pandas `merge_asof(tolerance=...)`
    * semantics). Still one shuffle: the tolerance check reuses the
    * matched ts carried inside the struct.
    *
    * Duplicate right rows at the same (key, ts) are resolved by a
    * deterministic tiebreaker (hash of the full right payload struct,
    * largest wins) so repeated runs agree; which duplicate a given
    * engine "should" pick is undefined in both pandas and DuckDB, so
    * callers needing oracle-exact parity should keep (key, ts) unique
    * on the right.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // right rows sort before left rows at equal ts in TRAVERSAL order
    // (asc for backward, desc for forward), so a simultaneous right
    // row is visible in both directions; the payload hash makes the
    // order total among duplicate-(key, ts) right rows
    val w = Window.partitionBy(col(keyCol))
      .orderBy(
        (if (direction == "backward") col(tsCol).asc else col(tsCol).desc),
        col("__side").asc,
        xxhash64(col("__p")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = unionTagged(left, right, keyCol, tsCol, payloadCols)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    gateAndProject(withMatch, left.columns.toSeq, tsCol, payloadCols,
      direction, tolerance,
      right.schema(tsCol).dataType.isInstanceOf[TimestampType])
  }

  /** Hot-key as-of: identical output to [[asOf]], but the heavy
    * window partitions by (key, ⌊ts/bucketWidth⌋) so a single key's
    * rows spread across time buckets — the mitigation SCALING.md
    * prescribes for keys too large for one sort task.
    *
    * Two-level structure:
    *   1. Within each (key, bucket): the standard union+window pass
    *      resolves matches whose right row lives in the same bucket.
    *   2. Across buckets: a per-(key, bucket) summary (the bucket's
    *      LAST right row in traversal order, null if none) feeds a
    *      second window over buckets — skinny: one row per bucket,
    *      NOT per event — whose strictly-before running last is the
    *      carry into each bucket; rows unmatched within their bucket
    *      take the carry.
    *
    * Cost: one full-data shuffle (the bucketed window; the summary
    * aggregate reuses its partitioning) plus two shuffles of the
    * bucket-count-sized summary. `bucketWidth` is in MICROSECONDS for
    * timestamp ts columns, the column's own units otherwise; choose
    * it so a hot key's densest bucket fits a sort task (~10⁶ rows).
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], bucketWidth: Long,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val backward = direction == "backward"
    val isTs = right.schema(tsCol).dataType.isInstanceOf[TimestampType]
    def micros(c: Column) = if (isTs) unix_micros(c) else c
    val m = micros(col(tsCol))
    // true integral floor division: subtract the (always non-negative)
    // pmod remainder, then integer `div`. Column `/` would promote to
    // double — exact for epoch micros but NOT for a raw long ts in
    // e.g. nanoseconds (~1.7e18 > 2^53), the precise rounding-vs-
    // truncation parity bug this repo hit in round 1 with `ts/1000L`.
    val u = unionTagged(left, right, keyCol, tsCol, payloadCols)
      .withColumn("__exact_mult", m - pmod(m, lit(bucketWidth)))
      .withColumn("__b", expr(s"__exact_mult div ${bucketWidth}L"))
      .drop("__exact_mult")
    val wIn = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(
        (if (backward) col(tsCol).asc else col(tsCol).desc),
        col("__side").asc,
        xxhash64(col("__p")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = u
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(wIn))
    // per-bucket summary: the LAST right row in traversal order —
    // max_by (ts, hash) for backward, min_by (ts, ~hash) for forward
    // (bitwise NOT reverses hash order without negation overflow);
    // max_by/min_by skip rows whose ordering key is null, so left
    // rows never win the pick and right-free buckets summarize null
    val rts = col("__p").getField("__rts")
    val orderKey = when(col("__side") === 0,
      struct(micros(rts),
        if (backward) xxhash64(col("__p"))
        else bitwise_not(xxhash64(col("__p")))))
    val pick =
      if (backward) max_by(col("__p"), orderKey) else min_by(col("__p"), orderKey)
    val summaries = u.groupBy(col(keyCol), col("__b")).agg(pick.as("__pb"))
    // strictly-before running last over the skinny bucket axis
    val wSum = Window.partitionBy(col(keyCol))
      .orderBy(if (backward) col("__b").asc else col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = summaries
      .withColumn("__carry", last(col("__pb"), ignoreNulls = true).over(wSum))
      .select(col(keyCol), col("__b"), col("__carry"))
    val withMatch = inBucket.filter(col("__side") === 1)
      .join(carried, Seq(keyCol, "__b"), "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
    gateAndProject(withMatch, left.columns.toSeq, tsCol, payloadCols,
      direction, tolerance, isTs)
  }
}
