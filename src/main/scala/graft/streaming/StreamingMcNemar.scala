package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X246 — streaming face of X227 McNemar: the 2×2 paired-verdict
  * grid is four longs of tracker state (the smallest member of the
  * bounded-tracker suite after X216's nine) — each micro-batch's
  * cell counts add in, and the continuity-corrected χ² is readable
  * after any batch: the LIVE "is the new filter drifting away from
  * the old one" monitor during a shadow deployment, identical after
  * N batches to [[graft.operators.Hypothesis.mcnemar]] over the
  * concatenation (spec-asserted — integer cells make parity exact).
  */
object StreamingMcNemar {

  final class Tracker private[StreamingMcNemar] () {
    private[streaming] var n00, n01, n10, n11 = 0L

    def update(batch: DataFrame, aCol: Column, bCol: Column): Unit = {
      val r = batch.agg(
        sum(when(!aCol && !bCol, 1L).otherwise(0L)).as("c00"),
        sum(when(!aCol && bCol, 1L).otherwise(0L)).as("c01"),
        sum(when(aCol && !bCol, 1L).otherwise(0L)).as("c10"),
        sum(when(aCol && bCol, 1L).otherwise(0L)).as("c11")).head()
      n00 += Option(r.getAs[Long]("c00")).getOrElse(0L)
      n01 += Option(r.getAs[Long]("c01")).getOrElse(0L)
      n10 += Option(r.getAs[Long]("c10")).getOrElse(0L)
      n11 += Option(r.getAs[Long]("c11")).getOrElse(0L)
    }

    /** (n00, n01, n10, n11, chi2, shareAOnly) — the batch operator's
      * double shapes; chi2/share None when no disagreement yet.
      */
    def report(): (Long, Long, Long, Long, Option[Double],
        Option[Double]) = {
      val b = n10.toDouble
      val c = n01.toDouble
      if (n01 + n10 == 0L) (n00, n01, n10, n11, None, None)
      else {
        val diff = math.abs(b - c) - 1.0
        val num = if (diff > 0.0) diff * diff else 0.0
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        (n00, n01, n10, n11, Some(r6(num / (b + c))),
          Some(r6(b / (b + c))))
      }
    }
  }

  def tracker(): Tracker = new Tracker()
}
