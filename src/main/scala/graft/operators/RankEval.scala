package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X144 — ranking-quality evaluation (NDCG@k): the offline metric a
  * retrieval/reranking pipeline tracks per release, computed over any
  * (query, rank, relevance) table — e.g. an ANN top-k joined against
  * relevance labels.
  *
  * NDCG convention: DCG = Σ_{rank≤k} gain(rel)/log2(rank+1) with
  * gain(r) = 2^r − 1 (graded; = rel for binary labels), and IDCG
  * re-sorts the RETRIEVED list ideally (the reranker-eval convention —
  * it scores ORDERING quality of what was returned; recall quality is
  * a separate metric). Queries with no relevant result report NULL.
  *
  * Exactness: rels and ranks are ints; per-position terms are one
  * fixed-shape double expression; ≤k-term sums drift at most a few
  * ulp across engines/orders, absorbed by round(6) — the
  * docPerplexity convention.
  *
  * Scale shape: one groupBy(query) over the top-k table (k rows per
  * query — map-side combinable); IDCG folds over a ≤k int sequence in
  * the same aggregate. Nothing wider than the ranked list moves.
  */
object RankEval {

  def ndcgAtK(ranked: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"bad k $k")
    def log2c(c: Column): Column = log(2.0, c)
    val gain = (pow(lit(2.0), col(relCol).cast("double")) - 1.0) /
      log2c(col(rankCol).cast("double") + 1.0)
    val topK = ranked.filter(col(rankCol) <= k)
      .withColumn("__g", gain)
    val agg = topK.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("__g")).as("__dcg"),
        sort_array(collect_list(col(relCol).cast("long")), asc = false)
          .as("__rels"))
    // IDCG: the same gains over the ideally-ordered retrieved rels
    val idcg = aggregate(
      zip_with(col("__rels"),
        sequence(lit(1L), greatest(size(col("__rels")).cast("long"), lit(1L))),
        (r, i) => (pow(lit(2.0), r.cast("double")) - 1.0) /
          log2c(i.cast("double") + 1.0)),
      lit(0.0), (acc, x) => acc + x)
    agg.select(col(queryCol), col("n_ranked"),
        aggregate(col("__rels"), lit(0L), (a, r) =>
          a + when(r > 0, 1L).otherwise(0L)).as("n_relevant"),
        col("__dcg"), idcg.as("__idcg"))
      .select(col(queryCol), col("n_ranked"), col("n_relevant"),
        when(col("__idcg") > 0.0, round(col("__dcg") / col("__idcg"), 6))
          .as("ndcg"))
  }
}
