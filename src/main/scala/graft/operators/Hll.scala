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
}
