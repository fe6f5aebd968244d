package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of X185 Benford first-digit QA: each micro-batch's
  * digit counts add into a 9-cell grid, and the conformance report
  * (observed vs n·log₁₀(1+1/d), χ² terms) is readable after any
  * batch — the live fabricated-feed monitor. Integer cells make the
  * tracker after N batches IDENTICAL to
  * [[graft.operators.DistStats.benford]] over
  * the concatenated input (spec-asserted) — the bounded-tracker
  * layout of the streaming sketch suite, at its smallest possible
  * state: nine longs.
  */
object StreamingBenford {

  final class Tracker private[StreamingBenford] () {
    private[streaming] val counts = Array.ofDim[Long](10)

    def update(batch: DataFrame, valueCol: String): Unit =
      batch.select(round(col(valueCol) * 100, 0).cast("long").as("__c"))
        .filter(col("__c") > 0L)
        .select(substring(col("__c").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .collect()
        .foreach(r => counts(r.getAs[Int]("digit")) +=
          r.getAs[Long]("n"))

    /** (digit, observed, expected, chi2_term) rows — the batch
      * operator's exact double shapes over the accumulated grid.
      */
    def report(): Seq[(Int, Long, Double, Double)] = {
      val n = counts.sum.toDouble
      (1 to 9).filter(counts(_) > 0L).map { d =>
        val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
        val e = n * p
        val obs = counts(d)
        val chi = (obs - e) * (obs - e) / e
        (d, obs, math.floor(e * 1e6 + 0.5) / 1e6,
          math.floor(chi * 1e6 + 0.5) / 1e6)
      }
    }
  }

  def tracker(): Tracker = new Tracker()
}
