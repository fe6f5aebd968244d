package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`) — north star X2 (SURVEY.md §2.10).
  *
  * Vector math is pure higher-order-function expressions
  * (`transform`/`zip_with`/`aggregate`) in DoubleType — codegen'd,
  * no UDF, and numerically identical to a sequential fold so the
  * DuckDB oracle can reproduce values bit-for-bit before rounding.
  *
  * Scale notes (100 TB):
  *   - Brute-force top-k is O(|Q|·|N|): correct baseline, usable when
  *     the query side is small enough to broadcast (it is here — the
  *     join is a `broadcast` hash join, no shuffle of the corpus).
  *   - The LSH path buckets both sides by random-hyperplane sign bits
  *     (deterministic hyperplanes from xxhash64), turning the search
  *     into an equi-join on (table_id, bucket) — linear shuffle, and
  *     each bucket's candidate set is small. Recall is tunable with
  *     `tables` (independent hash tables = OR-amplification).
  */
object Similarity {

  /** Cast a float vector to double element-wise (precision parity). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product. Resolves to the native codegen
    * `vec_dot` expression (GraftExtensions) — one static call per
    * row instead of per-element interpreted HOFs; numerically
    * identical to the fold (same order of operations).
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k cosine neighbors of each query vector.
    * `queries`/`corpus`: (idCol, vecCol). Self-matches excluded.
    * Deterministic rank: similarity desc, then neighbor id asc.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (table t,
    * plane p, dimension d): a splitmix64-style mix folded into
    * [-1, 1). Computed ONCE at plan time (the hyperplane is a
    * constant) and shipped as an array literal — the per-row work is
    * just the dot product, nothing is hashed at runtime.
    */
  private def planeComponent(t: Int, p: Int, d: Int): Double = {
    var z = t.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L +
      d.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Sign-LSH bucket id of a vector for hash table `t`: `planes` sign
    * bits of dot(v, hyperplane) packed into a long. `dims` fixes the
    * hyperplane literals' length (vectors beyond it are truncated).
    */
  def lshBucket(v: Column, t: Int, planes: Int, dims: Int = 64): Column =
    (0 until planes).map { p =>
      val plane = typedlit((0 until dims).map(d => planeComponent(t, p, d)))
      val proj = aggregate(zip_with(v, plane, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) ANN — the other classic scale path: cluster
    * the corpus with MLlib KMeans (distributed fit, fixed seed),
    * bucket every vector by nearest centroid, and have each query
    * probe only its `nprobe` closest centroids' buckets, re-ranking
    * candidates with exact cosine. The centroid table is tiny and
    * ships as literals, so probe selection is pure per-row math; the
    * candidate join is an equi-join on centroid id (shuffle ∝
    * corpus/nlist per probe, never all-pairs).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feats = corpus.select(col(idCol),
      array_to_vector(toDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(feats)
    val centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq

    def sqDistToCentroid(v: Column, c: Seq[Double]): Column =
      aggregate(zip_with(v, typedlit(c), (x, w) => (x - w) * (x - w)),
        lit(0.0), (acc, x) => acc + x)

    // centroid ids ordered by distance, built from ONE array of
    // (dist, cid) structs. NB: an argmin via reduce(when(a<=b,a,b))
    // would duplicate the whole distance subtree at every step —
    // exponential expression blowup at nlist=16.
    def rankedCids(v: Column): Column =
      transform(array_sort(array(centroids.zipWithIndex.map {
        case (c, i) =>
          struct(sqDistToCentroid(v, c).as("d"), lit(i).as("cid"))
      }: _*)), s => s.getField("cid"))

    def nearest(v: Column): Column = element_at(rankedCids(v), 1)

    def probes(v: Column): Column = slice(rankedCids(v), 1, nprobe)

    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("neighbor_v"))
      .withColumn("cid", nearest(col("neighbor_v")))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("query_v"))
      .select(col("query_id"), col("query_v"),
        explode(probes(col("query_v"))).as("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("query_v"), col("neighbor_v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Approximate top-k: candidates share an LSH bucket in ≥1 of
    * `tables` hash tables; exact cosine re-rank on candidates only.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, planes: Int = 8): DataFrame = {
    def bucketed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), toDouble(col(vecCol)).as(s"${side}_v"))
        .select(col(s"${side}_id"), col(s"${side}_v"),
          posexplode(array((0 until tables).map(t =>
            lshBucket(col(s"${side}_v"), t, planes)): _*)))
        .withColumnRenamed("pos", "table_id")
        .withColumnRenamed("col", "bucket")
    val q = bucketed(queries, "query")
    val c = bucketed(corpus, "neighbor")
    val cand = q.join(c, Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("query_v"),
        col("neighbor_id"), col("neighbor_v"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cosine(col("query_v"), col("neighbor_v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
