package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Partition/order independence of the r13 integer-state fits — the
  * property that makes their oracles (and the 100 TB claim) honest:
  * the md5-ordered fit sample is a deterministic SET regardless of
  * how the input is partitioned, integer Lloyd updates commute, and
  * the portable-HLL register merge is an elementwise max — so a
  * 1000-executor cluster, a single thread, and the DuckDB oracle all
  * produce bit-identical centroids, assignments and sketches.
  */
class FitDeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dir = "/root/testdata/sf0.001"

  test("assignClusters is invariant under repartitioning and input " +
    "row order") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
      Similarity.assignClusters(df, "vec_id", "embedding", k = 6)
        .select($"vec_id", $"cluster_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._1)
    val base = run(emb)
    assert(run(emb.repartition(13)) == base)
    assert(run(emb.orderBy($"vec_id".desc)) == base)
    assert(base.map(_._2).distinct.size > 1, "degenerate clustering")
  }

  test("ivfTopK results are invariant under corpus repartitioning") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def run(c: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
      Similarity.ivfTopK(queries, c, "vec_id", "embedding", 5,
          nlist = 8, nprobe = 3)
        .select($"query_id", $"neighbor_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sortBy(t => (t._1, t._3))
    assert(run(emb.repartition(11)) == run(emb))
  }

  test("portable HLL sketches are bit-identical under repartitioning " +
    "and shard-then-merge equals whole") {
    val s = spark
    import s.implicits._
    val df = (0 until 4000).map(i => (s"g${i % 2}", s"u${i % 900}"))
      .toDF("grp", "uid")
    val base = Hll.groupSketches(df, "grp", "uid")
      .select($"grp", $"sketch", $"estimate").collect()
      .map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2)))
      .sortBy(_._1)
    val repart = Hll.groupSketches(df.repartition(17), "grp", "uid")
      .select($"grp", $"sketch", $"estimate").collect()
      .map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2)))
      .sortBy(_._1)
    assert(repart.toSeq == base.toSeq)
  }
}
