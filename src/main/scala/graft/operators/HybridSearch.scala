package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of independently
  * ranked candidate lists, the standard way to combine a lexical
  * (inverted-index) ranking with a vector (embedding) ranking without
  * calibrating their score scales: score(d) = Σ_lists 1/(kRrf +
  * rank_list(d)), missing-from-a-list contributes 0 (Cormack &
  * Clarke's RRF, kRrf = 60 by convention). Ranks are integers, so the
  * fused scores are sums of exact rationals — engine-reproducible.
  *
  * The reference has no retrieval surface (its search is the
  * training-data pipeline itself); this extends the engine's X2/X26
  * rankers into the hybrid shape a corpus-curation stack actually
  * queries ("find items like this one, by words AND by meaning").
  */
object HybridSearch {

  /** Fuse `lists` — each (idCol, rank) with rank 1-based within that
    * list — into a top-`k` RRF ranking: (idCol, rrf_score, rank).
    *
    * Plan shape: per-list projections union into one skinny (id,
    * contribution) stream, one hash aggregate sums contributions per
    * id (map-side combinable), and the final top-k window orders a
    * candidate set bounded by Σ list sizes — the lists are top-k
    * slices themselves, so this is metadata-sized at any corpus
    * scale; the heavy lifting stays in the upstream rankers.
    *
    * With more than two lists, double summation order makes ±1-ulp
    * differences possible across engines — round fused scores before
    * hash-comparing (the contract query fuses two).
    */
  def rrf(lists: Seq[DataFrame], idCol: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val contribs = lists
      .map(df => df.select(col(idCol),
        (lit(1.0) / (lit(kRrf) + col("rank"))).as("__c")))
      .reduce(_ unionByName _)
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    contribs.groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
