package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X129 — persistable, MERGEABLE distinct-count sketches via Spark's
  * native Apache DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, Spark ≥ 3.5): X4's
  * `approx_count_distinct` answers one query and evaporates; a
  * SKETCH TABLE is what cross-snapshot monitoring actually stores —
  * per-partition binary sketches written with each release, unioned
  * later to answer "distinct users across any subset of snapshots /
  * sources" without rescanning data (the Theta/HLL warehouse
  * pattern). Merge-of-parts equals sketch-of-whole exactly (same
  * lgK — the HLL register merge is associative), spec-asserted.
  *
  * Scale shape: one map-side-combinable sketch agg per group (state
  * = 2^lgK registers, constant); merges touch only the
  * \|groups\|-row sketch table. Rows-only contract (estimates have
  * no DuckDB twin); the spec bounds error vs the exact count and
  * asserts part-vs-whole merge equality.
  */
object Hll {

  /** Per-group binary HLL sketch + its estimate. */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
      .select(col(groupCol), col("sketch"),
        hll_sketch_estimate(col("sketch")).cast("long").as("estimate"))

  /** Union a sketch table to one total-estimate row. */
  def mergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(hll_union_agg(col("sketch")).as("sketch"))
      .select(hll_sketch_estimate(col("sketch")).cast("long")
        .as("estimate"))

  /** X236 — HLL set algebra over a sketch table: for every group
    * pair, \|A∪B\| comes from the register-max union (exact HLL
    * semantics), and \|A∩B\| / Jaccard by inclusion-exclusion
    * est(A)+est(B)−est(A∪B) (clamped at 0 — I-E on estimates can go
    * slightly negative for near-disjoint sets). The warehouse payoff
    * of storing SKETCHES instead of counts: "how much do source A
    * and source B overlap in users/URLs/doc-hashes" for ALL pairs
    * without ever rescanning data — at 100 TB the raw pairwise
    * distinct-intersection is a full-data self-join; this is a
    * \|groups\|² join over constant-size registers.
    *
    * Intersection error grows as the true overlap shrinks relative
    * to the union (standard I-E caveat, documented not hidden): the
    * spec bounds it on known sets. Rows-only contract (estimates
    * have no DuckDB twin), scalar columns only.
    */
  def setAlgebra(sketches: DataFrame, groupCol: String): DataFrame = {
    val a = sketches.select(col(groupCol).as("group_a"),
      col("sketch").as("__sa"))
    val b = sketches.select(col(groupCol).as("group_b"),
      col("sketch").as("__sb"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        hll_sketch_estimate(col("__sa")).cast("long").as("est_a"),
        hll_sketch_estimate(col("__sb")).cast("long").as("est_b"),
        hll_sketch_estimate(hll_union(col("__sa"), col("__sb")))
          .cast("long").as("est_union"))
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_est",
        when(col("est_union") > 0L,
          round(col("est_intersect").cast("double") /
            col("est_union").cast("double"), 6)).otherwise(lit(0.0)))
  }
}
