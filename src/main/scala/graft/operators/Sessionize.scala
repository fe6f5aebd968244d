package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{AsrWord, EqualRun, GroupedRun}

/** W2 — gap-bridging sessionization (claude_research_optimal.py:291–305)
  * as the classic lag → boundary-flag → running-sum pattern. One window
  * (= one shuffle by the partition keys) produces contiguous group ids;
  * no driver-side state, so it scales linearly with documents/users.
  */
object Sessionize {

  /** Generic form: 1-based contiguous session ids per partition.
    * `isBoundary` should be true on rows that START a new session
    * (lag-null first rows included).
    */
  def sessionId(
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      isBoundary: Column): Column = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(when(isBoundary, 1L).otherwise(0L)).over(w)
  }

  /** Reference-exact `merge_with_small_gaps`: group consecutive equal
    * runs (sorted by ai0) while word-gap ≤ maxGapWords AND time-gap ≤
    * maxGapTime; gap-time = asr[nxt.ai0].start − asr[prev.ai1−1].end
    * (claude_research_optimal.py:298–301). `prev` is the previous run
    * in ai0 order — exactly `lag`.
    *
    * Implemented as two broadcast-friendly equi-joins to fetch the two
    * boundary-word times, then one window pass. group_id is 0-based per
    * doc to match the reference's list index.
    */
  def mergeWithSmallGaps(
      runs: Dataset[EqualRun],
      asr: Dataset[AsrWord],
      maxGapWords: Long,
      maxGapTime: Double): Dataset[GroupedRun] = {
    val spark = runs.sparkSession
    import spark.implicits._

    val starts = asr.select($"doc_id", $"idx", $"start")
    val ends = asr.select($"doc_id", $"idx", $"end")

    val timed = runs
      .join(starts.withColumnRenamed("idx", "ai0")
        .withColumnRenamed("start", "start_time"), Seq("doc_id", "ai0"))
      .join(ends.withColumn("ai1", $"idx" + 1).drop("idx")
        .withColumnRenamed("end", "end_time"), Seq("doc_id", "ai1"))

    val w = Window.partitionBy($"doc_id").orderBy($"ai0")
    val gapW = $"ai0" - lag($"ai1", 1).over(w)
    val gapT = $"start_time" - lag($"end_time", 1).over(w)
    val boundary =
      lag($"ai1", 1).over(w).isNull || gapW > maxGapWords || gapT > maxGapTime

    timed
      .withColumn("group_id",
        sessionId(Seq($"doc_id"), Seq($"ai0"), boundary) - 1L)
      .select($"doc_id", $"group_id", $"bi0", $"bi1", $"ai0", $"ai1",
        $"start_time", $"end_time")
      .as[GroupedRun]
  }
}
