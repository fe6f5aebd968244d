package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cms

/** Streaming face of the X104 Count-Min sketch — the last persisted
  * sketch without a streaming twin (HLL, heavy hitters, Bloom,
  * quantile store, PSI and JS drift all have theirs): each
  * micro-batch's (row, bucket) counts add into the cumulative grid,
  * any key's frequency estimate is readable after any batch, and —
  * counters being plain integers — the tracker grid after N batches
  * is IDENTICAL to `Cms.sketch` over the concatenated batches
  * (spec-asserted).
  *
  * Driver state: depth×width longs (4×64 = 256 by default) — the
  * bounded-tracker layout shared by the whole streaming suite.
  */
object StreamingCms {

  final class Tracker private[StreamingCms] (depth: Int, width: Int) {
    private[streaming] val grid = Array.ofDim[Long](depth, width)

    def update(batch: DataFrame, keyCol: String): Unit =
      Cms.sketch(batch, keyCol, depth, width).collect().foreach { r =>
        grid(r.getAs[Int]("hash_row"))(r.getAs[Long]("bucket").toInt) +=
          r.getAs[Long]("cnt")
      }

    /** Point estimate: min over rows of the key's bucket counter —
      * the batch operator's exact arithmetic over the accumulated
      * grid.
      */
    def estimate(key: String): Long = {
      val spark = org.apache.spark.sql.SparkSession.active
      import spark.implicits._
      val buckets = Cms.sketch(Seq(key).toDF(s"__k"), "__k",
          depth, width)
        .collect().map(r => r.getAs[Int]("hash_row") ->
          r.getAs[Long]("bucket").toInt)
      buckets.map { case (j, b) => grid(j)(b) }.min
    }
  }

  def tracker(depth: Int = 4, width: Int = 64): Tracker = {
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"bad geometry ($depth, $width)")
    new Tracker(depth, width)
  }
}
