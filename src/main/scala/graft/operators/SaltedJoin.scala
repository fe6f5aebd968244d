package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-busting equi-join: the probe side is salted by a per-row hash
  * into `numSalts` sub-keys and the build side is replicated once per
  * salt, so a hot join key's rows spread across `numSalts` reducers
  * instead of funneling into one straggler task. Output is exactly
  * the plain inner join's.
  *
  * When to reach for this at 100 TB: a shuffled hash/sort-merge join
  * whose key distribution has heavy hitters too large for AQE's
  * skew-split (which only splits the PROBE side's oversized
  * partitions post-shuffle — it cannot split a single key). Salting
  * trades `numSalts`× replication of the build side for even key
  * distribution, so it fits when the build side is small-ish but too
  * big (or too volatile) to broadcast outright.
  */
object SaltedJoin {

  /** Inner-join `probe` and `build` on `probeKey == buildKey`.
    * `saltSrc` must be a probe-side column (any type) with high
    * cardinality — its hash spreads rows across salts; a constant
    * would put every row in one salt and change nothing.
    */
  def join(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, saltSrc: Column, numSalts: Int): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(numSalts.toLong)).cast("int"))
    // sequence+explode replicates each build row numSalts× — a narrow
    // map-side fan-out, no shuffle of its own
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    p.join(b, p("__salt") === b("__salt") &&
        p(probeKey) === b(buildKey))
      .drop("__salt")
  }
}
