package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of X112 ([[graft.operators.TimeSeries.rollingZScore]]):
  * per-key trailing-window z-score flags over an unbounded stream via
  * `flatMapGroupsWithState` — the batch form's window cannot cross a
  * micro-batch boundary, so the trailing reference window itself is
  * the keyed state (a ≤ `lookback` ring of integer centi-values, a
  * few hundred bytes per key in the state store, independent of
  * stream length).
  *
  * Exact batch parity, not approximate: the same integer-quantized
  * Σv/Σv² arithmetic (quantization and rounding via HALF_UP
  * BigDecimal, mirroring Spark's `round`), so an event stream split
  * across any number of micro-batches emits bit-identical rows to the
  * batch operator over the concatenated input — spec-asserted.
  * Events must arrive per-key ordered across batches (within a batch
  * they are sorted; cross-batch ordering is the source's contract,
  * as in [[StreamingSessionize.dualPredicateSessions]]).
  */
object StreamingAnomaly {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Double)

  /** Trailing quantized reference window, oldest first. */
  final case class Buf(q: Seq[Long])

  final case class AnomalyOut(event_id: Long, user_id: Long,
      value: Double, n_ref: Long, z: Option[Double], is_anomaly: Boolean)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  private def halfUp(v: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(v).setScale(scale, RoundingMode.HALF_UP)
      .doubleValue()

  def rollingZScore(events: Dataset[Event], lookback: Int = 20,
      minN: Int = 10, threshold: Double = 3.0): Dataset[AnomalyOut] = {
    require(lookback >= minN && minN >= 2,
      s"need lookback >= minN >= 2, got $lookback/$minN")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Event], state: GroupState[Buf]) => {
          var q = state.getOption.map(_.q.toVector)
            .getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[AnomalyOut]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val qv = halfUp(e.value * 100, 0).toLong
            val n = q.length.toLong
            val (z, flag) =
              if (n >= minN) {
                val s1 = q.sum
                val s2 = q.iterator.map(x => x * x).sum
                val varNum = s2 - s1.toDouble * s1 / n
                if (varNum > 0) {
                  val zv = (qv - s1.toDouble / n) / math.sqrt(varNum / n)
                  (Some(halfUp(zv, 6)), math.abs(zv) > threshold)
                } else (None, false)
              } else (None, false)
            out += AnomalyOut(e.event_id, uid, e.value, n, z, flag)
            q = (q :+ qv).takeRight(lookback)
          }
          state.update(Buf(q))
          out.result().iterator
        })
  }
}
