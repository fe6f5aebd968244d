package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs around the dedup/quality core: deterministic content
  * sampling and token-budget sharding. Pure Column expressions /
  * single-window plans — no UDFs, no driver state.
  */
object CorpusOps {

  /** Deterministic hash sampling: keep a row iff the top 32 bits of
    * md5(salt ‖ key) fall under `fraction`. Properties production
    * pipelines rely on:
    *   - reproducible across runs/engines (md5 is everywhere — the
    *     DuckDB oracle computes the identical predicate),
    *   - content-stable: adding/removing other rows never changes a
    *     row's fate (unlike reservoir/Bernoulli on row position),
    *   - nested samples: fraction 0.1 ⊂ fraction 0.2 for equal salt.
    */
  def hashSampleCol(key: Column, fraction: Double,
      salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key)), 1, 8), 16, 10)
      .cast("long") < math.round(fraction * 4294967296.0)

  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashSampleCol(col(keyCol), fraction, salt))

  /** Stratified deterministic sampling: per-stratum fractions (e.g.
    * downsample English, keep all of a low-resource language), same
    * md5 determinism as `hashSample` — the sample for a stratum at
    * fraction f equals `hashSample(f)` restricted to that stratum,
    * so cross-run/nested properties carry over. Strata absent from
    * `fractions` default to 0 (dropped) — explicit allowlisting, the
    * safe default for corpus mixing. The fractions ship as a map
    * literal: no join, the predicate stays codegen'd in the scan
    * stage.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = ""): DataFrame = {
    val thresholds = map(fractions.toSeq.flatMap { case (k, f) =>
      Seq(lit(k), lit(math.round(f * 4294967296.0)))
    }: _*)
    val hash = conv(substring(md5(concat(lit(salt), col(keyCol))), 1, 8),
      16, 10).cast("long")
    df.filter(hash <
      coalesce(element_at(thresholds, col(stratumCol)), lit(0L)))
  }

  /** Token-budget sharding: pack an ordered document stream into
    * training shards of ≈`budgetTokens` each — shard id = ⌊cumulative
    * tokens before the doc / budget⌋, per `partitionCol` (e.g.
    * source/language), docs in `orderCol` order. One window (= one
    * shuffle by partition + in-partition sort) produces the whole
    * assignment; a doc larger than the budget gets its own shard
    * rather than splitting (the common packing policy; splitting is
    * a tokenizer-level concern).
    *
    * The cumulative sort is per-PARTITION, not global — shards of
    * different sources build in parallel; skewed sources are the
    * partitionCol's responsibility (salt it upstream if one source
    * is half the corpus).
    */
  def tokenShards(df: DataFrame, partitionCol: String, orderCol: String,
      tokenCountCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens_before",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      // integral div: long `/` would detour through doubles and lose
      // exactness past 2^53 cumulative tokens (reachable at 100 TB)
      .withColumn("shard_id", expr(s"tokens_before div $budgetTokens"))
  }
}
