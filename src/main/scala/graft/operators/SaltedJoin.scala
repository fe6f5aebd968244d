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

  /** Key-skew diagnosis for [[join]]'s sizing decision (and for
    * reading AQE skew-split stats): one row with the key-count
    * distribution's tails and the salt count that would level the
    * hottest key to the mean — `ceil(max_count · n_keys / n_rows)`.
    * Cost: one groupBy over the key (8-byte rows, map-side combined)
    * + an agg over the per-key counts (n_keys rows) — the profile of
    * a 100 TB table is a two-stage job over skinny data. The hot key
    * reports deterministically (ties → largest key).
    */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val agg = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_count"))
    val hot = counts.orderBy(col("cnt").desc, col("k").desc).limit(1)
      .select(col("k").as("hot_key"))
    agg.crossJoin(hot)
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        col("hot_key"),
        round(col("max_count").cast("double") / col("n_rows"), 6)
          .as("top_share"),
        // double math before the multiply: max_count · n_keys can
        // pass Long.MaxValue on the table sizes this is for
        ceil(col("max_count").cast("double") * col("n_keys") /
            col("n_rows"))
          .cast("long").as("suggested_salts"))
  }

  /** X256 — per-key salting plan: the actionable sequel to
    * [[skewProfile]] (one summary row) — a PLAN TABLE listing every
    * key whose row count exceeds `targetPerTask` with its salt
    * factor ⌈count/target⌉, ready to broadcast into [[join]]'s
    * salted path (salt only the listed keys; everything else joins
    * un-exploded, so the build-side blow-up is paid exactly where
    * skew exists and nowhere else). Pure integer arithmetic
    * ((c + t − 1) div t — no ceil-on-double edge), key-count-bounded
    * output, one map-side-combined count agg underneath.
    */
  def saltPlan(df: DataFrame, keyCol: String, targetPerTask: Long)
      : DataFrame = {
    require(targetPerTask >= 1, s"bad targetPerTask $targetPerTask")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .filter(col("n_rows") > targetPerTask)
      .select(col(keyCol), col("n_rows"),
        expr(s"(n_rows + ${targetPerTask}L - 1) div ${targetPerTask}L")
          .as("salt_factor"))
  }
}
