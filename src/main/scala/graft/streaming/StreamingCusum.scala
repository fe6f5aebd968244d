package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of X196 ([[graft.operators.TimeSeries.cusum]]):
  * the one-sided CUSUM drift monitor over an unbounded stream via
  * `flatMapGroupsWithState`. The batch form's prefix-min identity
  * collapses to FOUR integers of keyed state — (n, P, minP, and the
  * first-alarm snapshot) — so state per key is constant, independent
  * of stream length.
  *
  * Exact batch parity: the same micro-unit quantization (HALF_UP
  * BigDecimal, mirroring Spark `round`) and the same integer
  * recurrence, so any micro-batch cut of an in-order stream yields
  * the identical (n_obs, s_max, alarm_n, s_at_alarm) summary —
  * spec-asserted. The per-batch emission is the key's CURRENT
  * summary row (update semantics), which is what a drift dashboard
  * tails.
  */
object StreamingCusum {

  final case class Obs(key: String, ts: java.sql.Timestamp,
      seq: Long, value: Double)

  final case class CusumState(n: Long, p: Long, minP: Long, sMax: Long,
      alarmN: Option[Long], alarmS: Option[Long])

  final case class CusumOut(key: String, n_obs: Long, s_max: Double,
      alarm_n: Option[Long], s_at_alarm: Option[Double])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  private def halfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(0, RoundingMode.HALF_UP)
      .longValue()

  def track(obs: Dataset[Obs], target: Double, slack: Double,
      threshold: Double): Dataset[CusumOut] = {
    require(threshold > 0, s"bad threshold $threshold")
    val mu = math.round((target + slack) * 1e6)
    val h = math.round(threshold * 1e6)
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Obs], state: GroupState[CusumState]) => {
          var st = state.getOption
            .getOrElse(CusumState(0L, 0L, 0L, 0L, None, None))
          it.toSeq.sortBy(o => (micros(o.ts), o.seq)).foreach { o =>
            val z = halfUp(o.value * 1e6) - mu
            val p = st.p + z
            val minP = math.min(st.minP, p) // minP starts at P_0 = 0
            val sn = p - math.min(0L, minP)
            val n = st.n + 1
            val (an, as) =
              if (st.alarmN.isEmpty && sn > h) (Some(n), Some(sn))
              else (st.alarmN, st.alarmS)
            st = CusumState(n, p, minP, math.max(st.sMax, sn), an, as)
          }
          state.update(st)
          Iterator.single(CusumOut(key, st.n,
            st.sMax.toDouble / 1e6,
            st.alarmN, st.alarmS.map(_.toDouble / 1e6)))
        })
  }
}
