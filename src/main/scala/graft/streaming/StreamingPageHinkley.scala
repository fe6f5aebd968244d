package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of X315 ([[graft.operators.TimeSeries.pageHinkley]]):
  * the running-mean-adaptive drift excursion over an unbounded
  * stream via `flatMapGroupsWithState`. The batch form's per-step
  * term (x_i − P_i/i − δ) needs only the running (n, P) pair, and
  * the excursion needs (m, minM, phMax, argmax) — SIX integers of
  * keyed state, constant per key.
  *
  * Exact batch parity: the same nano quantization of the exact
  * rational (x_i·i − P_i)/i (HALF_UP BigDecimal — mirroring Spark
  * `round`) and the same integer prefix/min/argmax recurrences, so
  * any micro-batch cut of an in-order stream yields the identical
  * (n, ph_max, ph_max_at, alarm) summary — spec-asserted against
  * the batch operator.
  */
object StreamingPageHinkley {

  final case class Obs(key: String, ts: java.sql.Timestamp,
      seq: Long, value: Double)

  final case class PhState(n: Long, p: Long, m: Long, minM: Long,
      phMax: Long, phMaxAt: Long)

  final case class PhOut(key: String, n: Long, ph_max: Double,
      ph_max_at: Long, alarm: Boolean)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  private def halfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(0, RoundingMode.HALF_UP)
      .longValue()

  def track(obs: Dataset[Obs], delta: Double, lambda: Double)
      : Dataset[PhOut] = {
    require(lambda > 0, s"bad lambda $lambda")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Obs], state: GroupState[PhState]) => {
          var st = state.getOption
            .getOrElse(PhState(0L, 0L, 0L, 0L, 0L, 0L))
          it.toSeq.sortBy(o => (micros(o.ts), o.seq)).foreach { o =>
            val n = st.n + 1
            val v = o.value.toLong // integral series (cast-to-long)
            val p = st.p + v
            // nano-quantized exact rational (v·n − P)/n − δ — the
            // identical fixed shape as the batch column expression
            val term = halfUp(
              ((v * n - p).toDouble / n.toDouble - delta) * 1e9)
            val m = st.m + term
            // batch running min INCLUDES the current m (its window
            // frame ends at the current row); first obs seeds it
            val runMin = if (st.n == 0L) m else math.min(st.minM, m)
            val ph = m - runMin
            // strict > keeps the EARLIEST argmax — the batch min(t)
            // tie-break (ph_1 = 0 = the initial phMax, at t = 1)
            val (phMax, phMaxAt) =
              if (st.n == 0L) (ph, n)
              else if (ph > st.phMax) (ph, n)
              else (st.phMax, st.phMaxAt)
            st = PhState(n, p, m, runMin, phMax, phMaxAt)
          }
          state.update(st)
          // round(6) mirrors the batch output column exactly
          val ph6 = java.math.BigDecimal.valueOf(st.phMax.toDouble / 1e9)
            .setScale(6, RoundingMode.HALF_UP).doubleValue()
          Iterator.single(PhOut(key, st.n, ph6,
            st.phMaxAt, st.phMax.toDouble / 1e9 > lambda))
        })
  }
}
