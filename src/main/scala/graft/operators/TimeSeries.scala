package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an event stream to a fixed grain,
  * materialize the missing buckets, and forward-fill the last
  * observation — pandas `resample(...).last().ffill()` semantics,
  * the standard shape for turning irregular event streams into
  * fixed-step training series.
  *
  * Scale notes (100 TB):
  *   - The bucket aggregate is map-side combined; the shuffle carries
  *     one row per (key, bucket), not per event.
  *   - The grid generates each key's own [min, max] bucket range —
  *     rows ∝ keys × span/grain, independent of event count.
  *   - The forward fill is one window per key ordered by bucket (the
  *     grid is already skinny); a key spanning years at minute grain
  *     should be range-chunked upstream, same mitigation as hot
  *     sessionization keys.
  */
object TimeSeries {

  /** Resample `events` to `grain` (a `date_trunc` unit: "hour",
    * "day", ...) per `keyCol`: per-bucket event count and last
    * observed `valueCol` (by `tsCol` order — ties must not exist or a
    * caller-chosen total order must be baked into `tsCol`),
    * forward-filled across empty buckets between each key's first
    * and last active bucket.
    *
    * Output: (keyCol, bucket, n_events, filled).
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, grain: String): DataFrame = {
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col(valueCol), col(tsCol)).as("last_value"))
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"),
          expr(s"interval 1 $grain"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_value"), ignoreNulls = true).over(w).as("filled"))
  }
}
