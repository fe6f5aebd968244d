package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of X131 ([[graft.operators.CorpusOps.psi]]): the
  * PSI monitoring loop as it actually deploys — the BASELINE (band
  * boundaries + band counts) is fitted once from a reference
  * snapshot, then each arriving micro-batch adds its banded counts to
  * the cumulative CURRENT histogram, and the PSI/verdict is readable
  * after any batch. Band counts are plain integers, so the streaming
  * score after N batches is IDENTICAL to the batch operator run over
  * the concatenated current slice (spec-asserted, not approximate).
  *
  * Driver state: `buckets` longs — constant, the [[StreamingHll]] /
  * [[StreamingHeavyHitters]] bounded-tracker layout.
  */
object StreamingDrift {

  final class Tracker private[StreamingDrift] (
      private[streaming] val boundaries: Array[Double],
      private[streaming] val baseline: Array[Long]) {
    private val buckets = baseline.length
    private val current = new Array[Long](buckets)

    private[StreamingDrift] def bandCounts(batch: DataFrame,
        valueCol: String): Array[Long] = {
      val band = boundaries.zipWithIndex
        .map { case (c, _) =>
          when(col(valueCol).cast("double") > c, 1).otherwise(0)
        }.reduce(_ + _)
      val out = new Array[Long](buckets)
      batch.groupBy(band.as("__band")).agg(count(lit(1)).as("__c"))
        .collect().foreach { r =>
          out(r.getAs[Int]("__band")) = r.getAs[Long]("__c")
        }
      out
    }

    /** Add one micro-batch of current-slice values. */
    def update(batch: DataFrame, valueCol: String): Unit = {
      val c = bandCounts(batch, valueCol)
      var i = 0
      while (i < buckets) { current(i) += c(i); i += 1 }
    }

    /** PSI of the accumulated current histogram vs the baseline
      * (add-one smoothing, the batch operator's exact arithmetic).
      */
    def psi(): Double = {
      val nb = baseline.sum.toDouble + buckets
      val nc = current.sum.toDouble + buckets
      var s = 0.0; var i = 0
      while (i < buckets) {
        // bands empty on BOTH sides don't enter the sum — the batch
        // operator aggregates only materialized bands; matching it
        // keeps streaming == batch exactly
        if (baseline(i) + current(i) > 0L) {
          val p = (baseline(i) + 1L) / nb
          val q = (current(i) + 1L) / nc
          s += (p - q) * math.log(p / q)
        }
        i += 1
      }
      s
    }

    def verdict(): String =
      if (psi() < 0.1) "stable" else if (psi() < 0.25) "moderate"
      else "major"
  }

  /** Fit the baseline: equal-population quantile boundaries + band
    * counts from the reference snapshot.
    */
  def fitBaseline(reference: DataFrame, valueCol: String,
      buckets: Int = 10): Tracker = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cuts = reference
      .agg(percentile(col(valueCol).cast("double"),
        typedlit(probs)).as("__c"))
      .collect().head.getSeq[Double](0).toArray
    val tracker = new Tracker(cuts, new Array[Long](buckets))
    val base = tracker.bandCounts(reference, valueCol)
    System.arraycopy(base, 0, tracker.baseline, 0, buckets)
    tracker
  }
}
