package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X167 — mergeable per-key embedding centroid store: per key
  * (source, snapshot, shard, cluster …) the exact nano-quantized
  * per-dimension SUM and the member count, as SCALAR rows
  * (key, dim, sum_nano, n) — the sixth member of the persisted-
  * sketch suite (HLL = distinct, MinHash = Jaccard, Bloom =
  * membership, CMS = frequency, LogHistogram = quantiles, THIS =
  * mean vector). Sums are integers (round(x·1e9) in DECIMAL(18,0),
  * the [[Similarity.embeddingDrift]] fixed-point convention), so the
  * store is bit-identical across engines, parquet-persists, and
  * merges by plain ADDITION — merge(parts) == build(union) exactly,
  * spec-asserted — which a double-mean store cannot promise (mean of
  * means ≠ mean, and double sums depend on order).
  *
  * [[compare]] reads centroid geometry (cosine, L2 gap) between two
  * keys' stored sums WITHOUT touching the vectors again — the
  * embeddingDrift readout lifted into a build-once/serve-many
  * artifact: nightly per-shard builds, server-side merge, drift
  * queries against history at the cost of |keys|·dim skinny rows.
  *
  * Scale shape: build = one posexplode + (key, dim) sum agg
  * (map-side combined, |keys|·dim rows out); merge = addition;
  * compare = a dim-bounded join + one-row fold.
  */
object CentroidStore {

  /** (key, dim, sum_nano, n) rows; `n` repeats per dim (scalar
    * layout).
    */
  def build(vecs: DataFrame, keyCol: String, vecCol: String)
      : DataFrame = {
    val q = round(col("x") * 1e9, 0).cast("decimal(18,0)")
    vecs.select(col(keyCol).as("key"),
        posexplode(Similarity.toDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy(col("key"), col("dim").cast("long").as("dim"))
      .agg(sum(q).cast("decimal(28,0)").as("sum_nano"),
        count(lit(1)).as("n"))
  }

  /** Sum-merge shard stores into coarser keys. Exact law:
    * merge(build(A), build(B)) == build(A ∪ B).
    */
  def merge(store: DataFrame, mergedKey: Column): DataFrame =
    store.groupBy(mergedKey.as("key"), col("dim"))
      .agg(sum(col("sum_nano")).cast("decimal(28,0)").as("sum_nano"),
        sum(col("n")).as("n"))

  /** Centroid cosine + normalized L2 gap between two stored keys —
    * from sums alone. Zero-direction centroids report NULL cosine
    * (the embeddingDrift convention).
    */
  def compare(store: DataFrame, keyA: String, keyB: String)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val a = store.filter(col("key") === keyA)
      .select(col("dim"), col("sum_nano").as("sa"), col("n").as("na"))
    val b = store.filter(col("key") === keyB)
      .select(col("dim"), col("sum_nano").as("sb"), col("n").as("nb"))
    a.join(b, Seq("dim"))
      .agg(max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"),
        sum((col("sa") * col("sb")).cast(dec)).as("__ab"),
        sum((col("sa") * col("sa")).cast(dec)).as("__aa"),
        sum((col("sb") * col("sb")).cast(dec)).as("__bb"),
        sum(((col("sa") * col("nb") - col("sb") * col("na")) *
          (col("sa") * col("nb") - col("sb") * col("na"))).cast(dec))
          .as("__g2"))
      .select(col("n_a"), col("n_b"),
        when(col("__aa") > 0 && col("__bb") > 0,
          round(col("__ab").cast("double") /
            (sqrt(col("__aa").cast("double")) *
              sqrt(col("__bb").cast("double"))), 6)).as("centroid_cos"),
        round(sqrt(col("__g2").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double") * 1e9),
          6).as("centroid_l2_gap"))
  }
}
