package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** X120 persisted IVF index: build-once/serve-many parity, recall vs
  * brute force, and the dynamic-partition-pruning serving plan.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val indexDir = {
    val d = Files.createTempDirectory("ivfidx").toString
    IvfIndex.build(spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", nlist = 8, dir = d)
    d
  }

  test("search recall >= 0.7 vs brute force; results deterministic") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(queries, emb, "vec_id",
      "embedding", 5))
    val a = IvfIndex.search(s, indexDir, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val recall = (brute & pairs(a)).size.toDouble / brute.size
    assert(recall >= 0.7, s"index recall $recall < 0.7")
    val b = IvfIndex.search(s, indexDir, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    assert(a.orderBy($"query_id", $"rank").collect().toSeq ==
      b.orderBy($"query_id", $"rank").collect().toSeq)
  }

  test("index layout: lists are partitioned by cid; store carries norms") {
    val files = new java.io.File(s"$indexDir/lists").listFiles()
    val cidDirs = files.filter(f => f.isDirectory &&
      f.getName.startsWith("cid="))
    assert(cidDirs.nonEmpty, "lists not partitioned by cid")
    val lists = spark.read.parquet(s"$indexDir/lists")
    assert(lists.columns.toSet == Set("id", "vec", "nrm", "cid"))
    // every corpus vector landed in exactly one list
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(lists.count() == n)
    assert(lists.select("id").distinct().count() == n)
  }

  test("search rejects a pre-r13 float-centroid index with an " +
    "actionable message, not a ClassCastException") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("ivfidx_old").toString
    // the pre-r13 on-disk shape: centroid as array<double>
    Seq((0, Seq(0.1, 0.2)), (1, Seq(0.9, 0.8)))
      .toDF("cid", "centroid")
      .write.mode("overwrite").parquet(s"$d/centroids")
    val queries = s.read.parquet(s"$dir/embeddings.parquet").limit(1)
    val e = intercept[IllegalStateException] {
      IvfIndex.search(s, d, queries, "vec_id", "embedding",
        k = 1, nprobe = 1)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("serving plan prunes unprobed lists via dynamic partition " +
    "pruning on the cid join") {
    val s = spark
    import s.implicits._
    val queries = s.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" % 100 === 0)
    val df = IvfIndex.search(s, indexDir, queries, "vec_id", "embedding",
      k = 3, nprobe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP filter on the list scan:\n${plan.take(2000)}")
  }
}
