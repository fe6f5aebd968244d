package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.HeavyHitters

/** Running heavy hitters over an unbounded stream — the streaming
  * face of [[HeavyHitters.exactByFraction]] (X44).
  *
  * Per micro-batch, the batch's per-partition Misra-Gries summaries
  * (the SAME distributed pass-1 as the batch operator) merge into a
  * driver-held cumulative summary by counter addition followed by MG
  * compaction back to ≤ k counters. By the mergeable-summaries
  * theorem (Agarwal et al., PODS'12) the cumulative summary keeps the
  * MG guarantee over the ENTIRE stream prefix:
  * f(x) − N/(k+1) ≤ est(x) ≤ f(x), so the emitted candidate set
  * {x : est(x) ≥ minFraction·N − N/(k+1)} is a provable SUPERSET of
  * the prefix's true heavy hitters.
  *
  * Counts are lower-bound estimates, not exact: the batch operator's
  * exact second pass recounts the full input, which an unbounded
  * stream no longer has. Callers needing exact counts over a bounded
  * window run the batch recount over that window's storage with the
  * candidate set emitted here.
  *
  * Scale shape: the heavy distributed work per batch is one
  * mapPartitions (no shuffle) producing ≤ partitions·k skinny rows;
  * driver state is ≤ k counters + one long, independent of stream
  * length — the state-store-free analogue of a stateful top-k.
  */
object StreamingHeavyHitters {

  /** Driver-held cumulative MG summary (≤ k counters + prefix count).
    * Thread-safe under foreachBatch's serial batch execution; `merge`
    * consumes pass-1 summary rows ((item, est) with a null-item
    * sentinel per partition carrying its element count).
    */
  final class Tracker(val k: Int) {
    require(k >= 1, s"k must be >= 1, got $k")
    private val counts = mutable.HashMap.empty[String, Long]
    private var total = 0L

    def n: Long = total
    def size: Int = counts.size

    private[streaming] def merge(rows: Iterator[(String, Long)]): Unit = {
      // the null key can only be the per-partition count sentinel:
      // misraGries drops null ITEMS before they reach the sketch (and
      // excludes them from n), so no counter row ever carries null
      rows.foreach {
        case (null, np) => total += np
        case (item, est) =>
          counts.update(item, counts.getOrElse(item, 0L) + est)
      }
      // MG compaction back to <= k counters: subtract the (k+1)-th
      // largest value from every counter, drop non-positive — the
      // standard mergeable-summary reduction (error adds, stays
      // <= N/(k+1) cumulatively)
      if (counts.size > k) {
        val cut = counts.values.toArray.sorted(Ordering[Long].reverse)(k)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreachEntry { (item, c) =>
          if (c - cut <= 0L) dead += item else counts.update(item, c - cut)
        }
        dead.foreach(counts.remove)
      }
    }

    /** Candidates ≥ `minFraction` of the prefix, with their lower-
      * bound estimates: est ≥ ⌈minFraction·N⌉ − ⌊N/(k+1)⌋ — every
      * true heavy hitter of the prefix qualifies. Deterministic
      * order (est desc, item).
      */
    def candidates(minFraction: Double): Seq[(String, Long)] = {
      require(minFraction > 1.0 / (k + 1),
        s"minFraction=$minFraction must exceed 1/(k+1)=${1.0 / (k + 1)}")
      val minCount = math.ceil(minFraction * total).toLong
      val slack = total / (k + 1)
      counts.iterator
        .filter { case (_, est) => est >= minCount - slack }
        .toSeq.sortBy { case (item, est) => (-est, item) }
    }
  }

  /** Wire a streaming frame into a foreachBatch writer that folds each
    * micro-batch into `tracker` and hands (batchId, prefix N, current
    * candidates) to `sink`. Caller adds trigger/checkpoint and starts.
    */
  def track(items: DataFrame, itemCol: String, tracker: Tracker,
      minFraction: Double)(
      sink: (Long, Long, Seq[(String, Long)]) => Unit)
      : DataStreamWriter[Row] = {
    // fail at wiring time, not asynchronously inside batch 0 (the
    // same up-front check as the batch twin exactByFraction)
    require(minFraction > 1.0 / (tracker.k + 1),
      s"minFraction=$minFraction must exceed " +
        s"1/(k+1)=${1.0 / (tracker.k + 1)}")
    items.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val rows = HeavyHitters.summaries(batch, itemCol, tracker.k)
        .collect()
        .iterator
        .map(r => (if (r.isNullAt(0)) null else r.getString(0),
          r.getLong(1)))
      tracker.merge(rows)
      sink(batchId, tracker.n, tracker.candidates(minFraction))
    }
  }
}
