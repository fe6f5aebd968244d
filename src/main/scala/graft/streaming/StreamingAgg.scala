package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregation — the canonical
  * Structured Streaming shape (SURVEY.md §2.9): `readStream` →
  * `withWatermark` → `groupBy(window(...))` → agg → append-mode sink.
  *
  * Scale shape: state is one row per open (window, key) pair in the
  * state store, partitioned by group key across executors; the
  * watermark closes windows and evicts their state, so memory is
  * bounded by (windows in flight × keys), not stream length. Late
  * events beyond the watermark are DROPPED — the documented
  * completeness/latency trade every production pipeline makes
  * explicitly.
  */
object StreamingAgg {

  /** Per-(window, keyCol) count and decimal-exact value sum over
    * tumbling (`slide` = None) or sliding windows of `windowDur`.
    * Works identically on batch frames (window agg without state) —
    * the parity the spec asserts.
    */
  def windowedTotals(events: DataFrame, keyCol: String, watermark: String,
      windowDur: String, slide: Option[String] = None): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), windowDur, s)
      case None => window(col("ts"), windowDur)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
  }
}
