package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X120 — PERSISTED inverted-file ANN index: [[Similarity.ivfTopK]]
  * re-fits its coarse quantizer on every call, which is the right
  * shape for a one-shot query but not for production ANN, where the
  * index is built once and served many times (the FAISS
  * `write_index`/`read_index` lifecycle). `build` fits the coarse
  * centroids, assigns every corpus vector to its nearest list, and
  * writes the lists as parquet PARTITIONED BY list id — so a search
  * that probes `nprobe` of `nlist` lists physically reads only those
  * directories. `search` loads the (nlist-sized) centroid table,
  * ranks probes per query from plan literals, and broadcast-joins the
  * exploded probe set against the list store: Spark inserts a
  * DYNAMIC PARTITION PRUNING filter on the scan (spec-audited), so
  * the unprobed ~(1 − nprobe/nlist) of the index is never read from
  * disk — the property that makes a 10⁹-vector index servable.
  *
  * Determinism: same fit seed and iteration budget as `ivfTopK`;
  * norms are stored at build time so serving never recomputes them.
  */
object IvfIndex {

  import Similarity.{cosine, dot, toDouble}

  private def rankKey(v: Column, c: Seq[Double]): Column =
    lit(c.map(x => x * x).sum) - lit(2.0) * dot(v, typedlit(c))

  private def rankedCids(v: Column, centroids: Seq[Seq[Double]]): Column =
    transform(array_sort(array(centroids.zipWithIndex.map {
      case (c, i) => struct(rankKey(v, c).as("d"), lit(i).as("cid"))
    }: _*)), s => s.getField("cid"))

  /** Fit the coarse quantizer and write the index under `dir`:
    * `dir/centroids` (cid, centroid) and `dir/lists` (id, vec, nrm)
    * partitioned by cid.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, dir: String, fitFraction: Double = 1.0): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampled =
      if (fitFraction >= 1.0) corpus else corpus.sample(fitFraction, 42L)
    val feats = sampled.select(
      array_to_vector(toDouble(col(vecCol))).as("features")).coalesce(4)
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setInitMode("random").setTol(1e-2).fit(feats)
    val centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("nrm", Similarity.l2norm(col("vec")))
      .withColumn("cid",
        element_at(rankedCids(col("vec"), centroids), 1))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/lists")
  }

  /** Top-k cosine search against a built index. The probe explode is
    * broadcast; the list store joins on its PARTITION column, so DPP
    * prunes unprobed list directories at the scan.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().sortBy(_.getAs[Int]("cid"))
      .map(_.getSeq[Double](1).toSeq).toSeq
    require(centroids.nonEmpty, s"no centroids under $dir")
    val lists = spark.read.parquet(s"$dir/lists")
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("query_v"))
      .select(col("query_id"), col("query_v"),
        explode(slice(rankedCids(col("query_v"), centroids), 1, nprobe))
          .as("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(lists, Seq("cid"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos",
        dot(col("query_v"), col("vec")) /
          (Similarity.l2norm(col("query_v")) * col("nrm")))
      .withColumnRenamed("id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
