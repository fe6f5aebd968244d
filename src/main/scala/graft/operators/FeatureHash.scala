package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X234 — the hashing trick (feature hashing, Weinberger et al.
  * 2009): map an unbounded token vocabulary into a FIXED number of
  * signed buckets, so a downstream linear model (the X109 quality
  * classifier) trains on k-dimensional vectors with NO vocabulary
  * table at all — the featurizer that never needs a dictionary
  * broadcast, never OOVs, and costs one hash per token at any corpus
  * size. The sign bit (a second independent hash) makes collisions
  * cancel in expectation instead of compounding, the property that
  * lets k stay small.
  *
  * Determinism: bucket = md5("<salt>b:" ‖ token) mod k and sign from
  * the parity of md5("<salt>s:" ‖ token) — the repo's salted-md5
  * convention (X5/X103/X211), replayable in any engine with md5.
  * Weights are exact integer sums of ±tf. Scale shape: explode →
  * one map-side-combined groupBy (doc, bucket); output ≤ docs·k
  * rows, the vocabulary never shuffles.
  */
object FeatureHash {

  /** Per-(id, bucket) signed token-frequency features. `tokensCol`
    * is an array column (e.g. [[Dedup.tokens]]).
    */
  def hashFeatures(df: DataFrame, idCol: String, tokensCol: Column,
      buckets: Int, salt: String = "fh"): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), s"bad buckets $buckets")
    val tok = df.select(col(idCol), explode(tokensCol).as("__t"))
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"${salt}b:"), col("__t"))), 1, 8),
        16, 10).cast("long"), lit(buckets.toLong))
    val sign = when(
      pmod(conv(substring(md5(concat(lit(s"${salt}s:"), col("__t"))),
        1, 8), 16, 10).cast("long"), lit(2L)) === 0L, 1L)
      .otherwise(-1L)
    tok.groupBy(col(idCol), bucket.as("bucket"))
      .agg(sum(sign).cast("long").as("weight"),
        count(lit(1)).cast("long").as("n_tokens"))
  }
}
