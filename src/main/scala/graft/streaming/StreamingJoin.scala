package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.9): each left event
  * joins right events of the same key whose timestamp falls in
  * [left.ts − lookback, left.ts]. The canonical Structured Streaming
  * two-stream pattern: both sides carry watermarks, and the time
  * bound lets the engine evict right-side state once the watermark
  * passes `ts + lookback` (without the bound, stream-stream join
  * state grows forever).
  *
  * Scale shape: state store keyed by the join key, partitioned across
  * executors; per-key state is bounded by lookback × event rate.
  * The same call works on static frames (plain range join) — the
  * batch-parity the spec asserts.
  */
object StreamingJoin {

  /** Inner interval join. `left`/`right` must share `keyCol` and have
    * otherwise-distinct column names; `leftTs`/`rightTs` are their
    * event-time columns (timestamps), `lookback` a SQL interval
    * string like "10 minutes", `watermark` the lateness bound for
    * both sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond: Column =
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookback") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs")
    l.join(r, cond, "inner")
      .drop(col(s"r.$keyCol"))
  }
}
