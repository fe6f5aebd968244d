package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, ShortType,
  ByteType, StringType}

/** Bloom-pruned semi join: filter the huge probe side against a
  * Bloom filter of the build keys BEFORE any shuffle, then run the
  * exact semi join on the survivors. The Bloom pass is advisory —
  * false positives sail through it and the follow-up join removes
  * them — so the result is exactly `probe SEMI JOIN build` at any
  * false-positive rate, while the shuffle moves only ~(selectivity +
  * fpp) of the probe instead of all of it.
  *
  * This is the explicit, caller-controlled form of Spark's own
  * runtime row-level filtering (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`, SPARK-32268), for when the optimizer
  * cannot inject it: the build side here may be any DataFrame (the
  * planner's version requires a shuffle-join shape it can rewrite),
  * and the filter survives into cached/reused subtrees.
  *
  * Scale sizing: the sketch is ~1.2 bytes/key at 1% fpp, built
  * distributed (treeAggregate) and broadcast once. 1e8 build keys →
  * ~120 MB broadcast: fine. 1e9+ → raise `fpp` (the join still
  * guarantees exactness; pruning just weakens) or pre-partition both
  * sides and prune per-partition. The probe-side check is a scala
  * UDF (the codegen'd BloomFilterMightContain expression is not
  * public API) — one virtual call per row against a broadcast bitmap;
  * it runs in the scan stage next to the parquet reader, so the
  * filtered rows never reach the exchange, which is the entire win.
  */
object BloomPrune {

  /** `probe` rows whose `probeKey` appears in `build.buildKey` —
    * exact semi-join output. Key must be an integral or string
    * column (the sketch API's domain).
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val ok = Set[org.apache.spark.sql.types.DataType](
      LongType, IntegerType, ShortType, ByteType, StringType)
    for ((df, k) <- Seq((probe, probeKey), (build, buildKey)))
      if (!ok(df.schema(k).dataType))
        throw new IllegalArgumentException(
          s"bloom prune needs an integral or string key, " +
            s"got ${df.schema(k).dataType} for $k")
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val might: Column = probe.schema(probeKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k))
        f(col(probeKey).cast("long"))
      case StringType =>
        val f = udf((k: String) => k != null && bc.value.mightContainString(k))
        f(col(probeKey))
      case dt => throw new IllegalArgumentException(
        s"bloom prune needs an integral or string key, got $dt")
    }
    // fresh build-side name: keeps the join condition unambiguous
    // when probeKey == buildKey (the natural same-name call). No
    // distinct() — a semi join's output is unchanged by duplicate
    // build keys, and deduping 1e8+ keys is a full wasted exchange.
    val pruned = probe.filter(might)
    val b = build.select(col(buildKey).as("__bloom_bk"))
    pruned.join(b, pruned(probeKey) === b("__bloom_bk"), "left_semi")
  }
}
