package graft.streaming

import scala.collection.mutable

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.DataFrame

import graft.operators.Hll

/** Streaming face of X129 ([[graft.operators.Hll]]): running
  * distinct-count estimates per group over an unbounded stream — the
  * [[StreamingHeavyHitters]] layout with an HLL union instead of a
  * Misra-Gries summary. Per micro-batch the distributed pass builds
  * the batch's per-group sketches (the SAME map-side-combinable agg
  * as the batch operator); the driver unions each into its cumulative
  * per-group sketch. The union is associative, so the cumulative
  * estimate tracks the single-pass whole-prefix sketch to within the
  * sparse→dense promotion jitter (±a register or two — the parity
  * spec bounds the difference at 1%, far inside HLL's own error),
  * and both track the exact count at the configured lgK accuracy.
  *
  * Driver state: one 2^lgK-register sketch per group — independent of
  * stream length and of per-group cardinality (the point of HLL).
  */
object StreamingHll {

  final class Tracker(val lgK: Int = 12) {
    private val unions = mutable.HashMap.empty[String, Union]

    /** Merge one micro-batch: `batch` must have (groupCol, keyCol). */
    def update(batch: DataFrame, groupCol: String, keyCol: String): Unit = {
      val parts = Hll.groupSketches(batch, groupCol, keyCol, lgK)
        .select(groupCol, "sketch").collect()
      parts.foreach { r =>
        val g = r.get(0).toString
        val sk = HllSketch.heapify(Memory.wrap(r.getAs[Array[Byte]](1)))
        unions.getOrElseUpdate(g, new Union(lgK)).update(sk)
      }
    }

    /** Current per-group estimates (rounded to long, the batch
      * operator's convention).
      */
    def estimates(): Map[String, Long] =
      unions.map { case (g, u) =>
        g -> u.getResult(TgtHllType.HLL_8).getEstimate.toLong
      }.toMap
  }
}
