package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming faces of the X353 filter-ablation matrix and the X357
  * clipping gate — the ingest-monitor deployment: every arriving
  * micro-batch folds its scan-stage integer counters into a
  * driver-held cumulative panel, readable after any batch.
  *
  * All state is plain long counters (\|gates\|² for ablation, three
  * for the clip panel) — constant regardless of stream length, the
  * [[StreamingDrift]]/[[StreamingHll]] bounded-tracker layout — and
  * because every counter is an exact integer, the cumulative panel
  * after N batches is IDENTICAL to the batch operator over the
  * concatenated input (parity spec-asserted, not approximate).
  */
object StreamingQa {

  /** Cumulative kill-overlap matrix: the streaming twin of
    * `CorpusOps.filterAblation`. Gates are fixed at construction
    * (plan literals — per batch ONE aggregate, no shuffle of rows).
    */
  final class AblationTracker(gates: Seq[(String, Column)]) {
    require(gates.size >= 2 && gates.size <= 32,
      s"need 2..32 gates, got ${gates.size}")
    require(gates.map(_._1).distinct.size == gates.size,
      "duplicate gate names")
    private val names = gates.map(_._1)
    private var nDocs = 0L
    private val both =
      scala.collection.mutable.HashMap.empty[(String, String), Long]

    /** Fold one micro-batch's counters in. */
    def update(batch: DataFrame): Unit = {
      val aggs = (for {
        (na, ga) <- gates; (nb, gb) <- gates
        if na <= nb
      } yield sum(when(ga && gb, 1L).otherwise(0L)).cast("long")
        .as(s"__k_${na}__$nb")) :+
        count(lit(1)).cast("long").as("__n")
      val r = batch.agg(aggs.head, aggs.tail: _*).collect()(0)
      nDocs += r.getAs[Long]("__n")
      for {
        na <- names; nb <- names
        if na <= nb
      } both((na, nb)) = both.getOrElse((na, nb), 0L) +
        r.getAs[Long](s"__k_${na}__$nb")
    }

    /** The cumulative matrix in the batch operator's row shape:
      * (n_docs, gate_a, gate_b, n_killed_a, n_killed_b,
      * n_killed_both, kill_jaccard) for every a < b pair.
      */
    def matrix(): Seq[Row] =
      for {
        na <- names; nb <- names
        if na < nb
      } yield {
        val a = both.getOrElse((na, na), 0L)
        val b = both.getOrElse((nb, nb), 0L)
        val ab = both.getOrElse((na, nb), 0L)
        val union = a + b - ab
        val jac: java.lang.Double =
          if (union > 0L)
            BigDecimal(ab.toDouble / union)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else null
        Row(nDocs, na, nb, a, b, ab, jac)
      }

    def n: Long = nDocs
  }

  /** Cumulative clip panel: total samples, clipped samples, and the
    * longest clipped run seen in any SINGLE clip (runs never span
    * clips, so the cross-batch max is exact).
    */
  final class ClipTracker(fullScale: Int = 32767) {
    private var samples = 0L
    private var clipped = 0L
    private var maxRun = 0L

    /** Fold one micro-batch of decoded clips (pcm samples column of
      * array<int>).
      */
    def update(batch: DataFrame, samplesCol: String): Unit = {
      val fs = fullScale
      val perClip = batch.select(col(samplesCol).as("__s"))
        .select(
          size(col("__s")).cast("long").as("__n"),
          size(expr(s"filter(__s, v -> abs(v) >= $fs)")).cast("long")
            .as("__c"),
          expr(
            s"""aggregate(__s,
                 named_struct('run', 0L, 'best', 0L),
                 (acc, v) -> if(abs(v) >= $fs,
                   named_struct('run', acc.run + 1L,
                     'best', greatest(acc.best, acc.run + 1L)),
                   named_struct('run', 0L, 'best', acc.best)),
                 acc -> acc.best)""").as("__r"))
        .agg(sum(col("__n")).cast("long").as("__n"),
          sum(col("__c")).cast("long").as("__c"),
          max(col("__r")).cast("long").as("__r"))
        .collect()(0)
      samples += perClip.getAs[Long]("__n")
      clipped += perClip.getAs[Long]("__c")
      if (!perClip.isNullAt(2))
        maxRun = math.max(maxRun, perClip.getAs[Long]("__r"))
    }

    def nSamples: Long = samples
    def nClipped: Long = clipped
    def longestRun: Long = maxRun
    def clipRatio: Double =
      if (samples > 0L) clipped.toDouble / samples else 0.0
  }
}
