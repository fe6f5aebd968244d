package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT quantiles over a distributed long column without sorting
  * anything: iterative histogram refinement on the VALUE domain —
  * each pass buckets the surviving value window `fanout` ways with
  * one map-side-combined groupBy, the driver picks the bucket
  * holding the target rank, and the window shrinks fanout-fold:
  * ⌈log_fanout(range)⌉ passes total (3 for a 2²⁴ domain at the
  * default 256), driver state three longs.
  *
  * Where it fits: `percentile` (exact) materializes and sorts every
  * value per group, and `approx_percentile` carries rank error — at
  * 100 TB, when the quantile feeds a CONTRACT (billing tiers, SLA
  * thresholds), this is "exact without a global sort": a handful of
  * full-scan histogram passes, no shuffle wider than `fanout` rows
  * per task. (A binary-search-on-count variant is simpler but pays
  * ~log₂(range) ≈ 40 sequential job round-trips — scheduler latency
  * dominates; fanout trades per-pass shuffle width for passes.)
  *
  * Result: the smallest v with rank(v) ≥ ⌈q·n⌉ — the lower exact
  * q-quantile, the definition a SQL oracle replays with one
  * cumulative-count window.
  */
object Quantiles {

  def exactQuantile(df: DataFrame, valueCol: String, q: Double,
      fanout: Int = 256): Long = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q")
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val row = df.agg(min(col(valueCol)), max(col(valueCol)),
      count(col(valueCol))).head()
    require(!row.isNullAt(2) && row.getLong(2) > 0, "no non-null values")
    val (mn, mx, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    var target = math.max(math.ceil(q * n).toLong, 1L)
    var lo = mn
    var hi = mx
    while (lo < hi) {
      // ceil((hi-lo+1)/fanout) as BigInt-free long math; width >= 1
      val span = hi - lo // >= 1; full-long ranges handled by BigInt
      val width = math.max(
        (BigInt(span) + 1 + fanout - 1).toLong / fanout, 1L)
      // integral `div`, not `/`: Column `/` is double division and
      // loses exactness past 2^53. (v − lo) needs the domain span to
      // fit a signed long — true unless the column spans all 2⁶⁴.
      val counts = df
        .filter(col(valueCol) >= lo && col(valueCol) <= hi)
        .groupBy(expr(
          s"CAST((`$valueCol` - (${lo}L)) div ${width}L AS BIGINT)")
          .as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      // walk buckets until the target rank falls inside one
      var acc = 0L
      var chosen = -1L
      for ((b, c) <- counts if chosen < 0) {
        if (acc + c >= target) { chosen = b; target -= acc }
        else acc += c
      }
      // target rank is guaranteed inside [lo, hi], so a bucket matched
      lo = lo + chosen * width
      hi = math.min(hi, lo + width - 1)
    }
    lo
  }
}
