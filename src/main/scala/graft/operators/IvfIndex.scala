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

  import Similarity.{cosine, dot, quantizeL, rankedCidsL, toDouble}

  /** Fit the coarse quantizer (the r13 integer-state [[Similarity
    * .fitCentersL]] — deterministic AND oracle-replayable) and write
    * the index under `dir`: `dir/centroids` (cid, centroid as
    * quantized longs) and `dir/lists` (id, vec, nrm) partitioned by
    * cid.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, dir: String, maxFitSample: Int = 10000): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = Similarity.fitCentersL(corpus, idCol, vecCol,
      nlist, iters = 5, Similarity.KmFitSalt, maxFitSample)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("nrm", Similarity.l2norm(col("vec")))
      .withColumn("__qv", quantizeL(col("vec")))
      .withColumn("cid",
        element_at(rankedCidsL(col("__qv"), centroids), 1))
      .drop("__qv")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/lists")
  }

  /** Top-k cosine search against a built index. The probe explode is
    * broadcast; the list store joins on its PARTITION column, so DPP
    * prunes unprobed list directories at the scan.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val centroidDf = spark.read.parquet(s"$dir/centroids")
    // On-disk format check: r13 moved centroids from float to
    // quantized array<long> (a different fit). An index persisted by
    // a pre-r13 build would otherwise surface as an opaque
    // ClassCastException here — fail with the actionable message.
    centroidDf.schema("centroid").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => ()
      case other => throw new IllegalStateException(
        s"$dir/centroids stores centroid as $other, not the " +
          "array<bigint> the r13+ integer-state format writes — " +
          "this index predates the format change; rebuild it with " +
          "IvfIndex.build")
    }
    val centroids = centroidDf
      .collect().sortBy(_.getAs[Int]("cid"))
      .map(_.getSeq[Long](1).toSeq).toSeq
    require(centroids.nonEmpty, s"no centroids under $dir")
    val lists = spark.read.parquet(s"$dir/lists")
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("query_v"))
      .withColumn("__qv", quantizeL(col("query_v")))
      .select(col("query_id"), col("query_v"),
        explode(slice(rankedCidsL(col("__qv"), centroids),
          1, nprobe)).as("cid"))
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
