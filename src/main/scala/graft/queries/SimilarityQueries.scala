package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.QueryDef.table

/** Similarity-search contract queries (north star X2) over the
  * `embeddings` table (64-dim float vectors).
  */
object SimilarityQueries {

  val K = 5
  /** Every 25th vector is a query point — a small, broadcastable
    * query side, the shape this operator is designed for.
    */
  val QueryStride = 25

  val defs: Seq[QueryDef] = Seq(

    // X2a: exact brute-force top-k cosine — the correctness baseline.
    // Broadcast(queries) ⋈ corpus: the corpus never shuffles, so the
    // plan scales to an arbitrarily large corpus side.
    QueryDef(
      "q_knn_brute",
      Some(s"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
        ), q AS (SELECT * FROM v WHERE vec_id % $QueryStride = 0),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) /
                 (sqrt(list_dot_product(q.e, q.e)) *
                  sqrt(list_dot_product(c.e, c.e))) AS cos
          FROM q JOIN v c ON q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
        FROM (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        )
        WHERE rank <= $K
        ORDER BY query_id, rank
      """.trim),
      "X2 brute-force top-k cosine neighbors")(
      (spark, dir) => {
        import spark.implicits._
        val emb = table(spark, dir, "embeddings")
        val queries = emb.filter($"vec_id" % QueryStride === 0)
        Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", K)
          .select($"query_id", $"neighbor_id", $"rank",
            round($"cos", 6).as("cos"))
          .orderBy($"query_id", $"rank")
      }),

    // X2b: sign-LSH bucketed ANN — the scale path. Candidates come
    // from an equi-join on (table_id, bucket); exact cosine re-ranks
    // candidates only. Hyperplanes are deterministic (xxhash64) but
    // not SQL-reproducible → rows-only driver check; recall vs
    // q_knn_brute is asserted in SimilaritySpec.
    QueryDef(
      "q_knn_lsh",
      None,
      "X2 LSH-bucketed approximate top-k cosine neighbors")(
      (spark, dir) => {
        import spark.implicits._
        val emb = table(spark, dir, "embeddings")
        val queries = emb.filter($"vec_id" % QueryStride === 0)
        Similarity.lshTopK(queries, emb, "vec_id", "embedding", K,
            tables = 24, planes = 4)
          .select($"query_id", $"neighbor_id", $"rank",
            round($"cos", 6).as("cos"))
          .orderBy($"query_id", $"rank")
      }),

    // X2c: IVF ANN — KMeans-bucketed inverted file, nprobe=4 of 16
    // lists probed per query, exact cosine re-rank. Rows-only
    // (KMeans isn't DuckDB-reproducible); SimilaritySpec bounds
    // recall vs the brute-force twin.
    QueryDef(
      "q_knn_ivf",
      None,
      "X2 IVF (KMeans inverted-file) approximate top-k cosine")(
      (spark, dir) => {
        import spark.implicits._
        val emb = table(spark, dir, "embeddings")
        val queries = emb.filter($"vec_id" % QueryStride === 0)
        Similarity.ivfTopK(queries, emb, "vec_id", "embedding", K,
            nlist = 16, nprobe = 4)
          .select($"query_id", $"neighbor_id", $"rank",
            round($"cos", 6).as("cos"))
          .orderBy($"query_id", $"rank")
      }),

    // X2d: label-centroid similarity — grouped vector aggregation:
    // per-label mean vector (element-wise, via posexplode + groupBy),
    // then each label's centroid norm. Exercises vector agg at scale
    // (the shuffle carries (label, dim) pairs — fully partial-agg'd).
    QueryDef(
      "q_label_centroids",
      Some("""
        WITH e AS (
          SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM embeddings
        ), c AS (
          SELECT label, dim, avg(x) AS m
          FROM e GROUP BY label, dim
        )
        SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
               count(*) AS dims
        FROM c GROUP BY label ORDER BY label
      """.trim),
      "X2 per-label centroid norms via element-wise vector mean")(
      (spark, dir) => {
        import spark.implicits._
        table(spark, dir, "embeddings")
          .select($"label",
            posexplode(Similarity.toDouble($"embedding")).as(Seq("dim", "x")))
          .groupBy($"label", $"dim").agg(avg($"x").as("m"))
          .groupBy($"label")
          .agg(round(sqrt(sum($"m" * $"m")), 6).as("centroid_norm"),
            count(lit(1)).as("dims"))
          .orderBy($"label")
      }),
  )
}
