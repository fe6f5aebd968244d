package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Similarity-search verification (SURVEY.md §2.10 X2): exact cosine
  * math on hand vectors, deterministic LSH recall vs brute force on
  * the sf0.001 embeddings.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val dir = "/root/testdata/sf0.001"

  import Similarity._

  test("bruteForceTopK: known vectors rank by cosine, ties by id") {
    val s = spark
    import s.implicits._
    // q = (1,0); neighbors: id1 (1,0) cos 1, id2 (1,1) cos .707,
    // id3 (0,1) cos 0, id4 (-1,0) cos -1
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(2f, 0f)), (2L, Array(1f, 1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val got = bruteForceTopK(q, vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(got(0)._3 - 1.0) < 1e-12)
    assert(math.abs(got(1)._3 - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(got(2)._3 - 0.0) < 1e-12)
  }

  test("bruteForceTopK excludes self-matches") {
    val s = spark
    import s.implicits._
    val vecs = Seq((0L, Array(1f, 2f)), (1L, Array(2f, 4f)))
      .toDF("vec_id", "embedding")
    val got = bruteForceTopK(vecs, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.exists(p => p._1 == p._2))
    assert(got.toSet == Set((0L, 1L), (1L, 0L)))
  }

  test("cosinePairsBlocked == naive broadcast all-pairs (ground truth)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val vecs = s.read.parquet(s"$dir/embeddings.parquet")
    // naive exact baseline: broadcast self-join, same fold math
    val v = vecs.select($"vec_id", toDouble($"embedding").as("e"))
      .withColumn("n", l2norm($"e"))
    val a = v.select($"vec_id".as("v1"), $"e".as("e1"), $"n".as("n1"))
    val b = v.select($"vec_id".as("v2"), $"e".as("e2"), $"n".as("n2"))
    val naive = broadcast(a).join(b, $"v1" < $"v2")
      .withColumn("cos0", dot($"e1", $"e2") / ($"n1" * $"n2"))
      .filter($"cos0" >= 0.4)
      .select($"v1", $"v2", $"cos0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    val blocked = cosinePairsBlocked(vecs, "vec_id", "embedding", 0.4, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(blocked.toSeq == naive.toSeq) // exact doubles, no tolerance
    assert(naive.nonEmpty)
  }

  test("IVF top-k recall >= 0.7 vs brute force on driver embeddings") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    val ivf = pairs(ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF recall $recall < 0.7")
  }

  test("LSH top-k recall >= 0.9 vs brute force on driver embeddings") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    val lsh = pairs(lshTopK(queries, emb, "vec_id", "embedding", 5,
      tables = 24, planes = 4))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("PQ top-k recall >= 0.7 vs brute force on driver embeddings") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    val pq = pairs(pqTopK(queries, emb, "vec_id", "embedding", 5,
      m = 16, ksub = 16, refine = 8))
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.7, s"PQ recall $recall < 0.7")
    // IVF-PQ composition: list pruning on top of the compressed scan
    // costs some recall vs plain PQ but must stay useful
    val ivfpq = pairs(ivfPqTopK(queries, emb, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4, m = 16, ksub = 16, refine = 8))
    val recallIvfPq = (brute & ivfpq).size.toDouble / brute.size
    assert(recallIvfPq >= 0.5, s"IVF-PQ recall $recallIvfPq < 0.5")
    // the exact re-rank means every reported cos equals the true
    // cosine — check one against the brute result
    val bruteCos = bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pqTopK(queries, emb, "vec_id", "embedding", 5, m = 16, ksub = 16,
        refine = 8)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        bruteCos.get(key).foreach { c =>
          assert(math.abs(c - r.getDouble(2)) < 1e-12, s"$key")
        }
      }
  }

  test("centroidOutliers: planted outlier ranks first, distances exact") {
    val s = spark
    import s.implicits._
    // label 0: (0,0), (0,0), (9,0) → centroid (3,0); dists 3, 3, 6
    // label 1: (1,1), (1,1)        → centroid (1,1); dists 0, 0
    val vecs = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0f, 0f), 0),
      (2L, Array(9f, 0f), 0),
      (3L, Array(1f, 1f), 1), (4L, Array(1f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .centroidOutliers(vecs, "vec_id", "embedding", "label", k = 3)
      .select($"vec_id", $"label", $"dist", $"rk")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3))).toSeq
    // top-3 by (dist desc, vec_id): the planted outlier, then the two
    // equidistant label-0 vectors in id order
    assert(got == Seq((2L, 0, 6.0, 1), (0L, 0, 3.0, 2), (1L, 0, 3.0, 3)))
  }

  test("incrementalSemDedup: best corpus match per new vector, " +
    "cluster-scoped, corpus never self-paired") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (10L, Array(1f, 0f), 0), (11L, Array(2f, 0f), 0), // parallel pair
      (12L, Array(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val batch = Seq(
      (1L, Array(3f, 0f), 0),  // cos 1 with BOTH 10 and 11 → tie → 10
      (2L, Array(1f, 0f), 1),  // parallel to 10/11 but cluster 1 → novel
      (3L, Array(0f, 2f), 1)   // matches 12
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.incrementalSemDedup(batch, corpus,
        "vec_id", "embedding", "label", tau = 0.9)
      .orderBy($"new_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // corpus pair (10, 11) never appears — only new-vs-corpus rows
    assert(got == Seq((1L, true, 10L), (2L, false, -1L), (3L, true, 12L)))
  }

  test("semDedup: pairs stay within clusters, components roll up, " +
    "singletons kept") {
    val s = spark
    import s.implicits._
    // cluster 0: ids 0,1 parallel (cos 1) and 2 orthogonal;
    // cluster 1: id 3 parallel to 0/1 but in ANOTHER cluster → no
    // pair despite cos 1 (the SemDeDup scoping); 4,5 parallel pair
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(2f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(3f, 0f), 1), (4L, Array(1f, 1f), 1),
      (5L, Array(2f, 2f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .semDedup(vecs, "vec_id", "embedding", "label", tau = 0.9)
      .orderBy($"vec_id")
      .select($"vec_id", $"component_id", $"is_kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, true),  // component root
      (1L, 0L, false), // deduped into 0
      (2L, 2L, true),  // orthogonal singleton
      (3L, 3L, true),  // cross-cluster twin of 0/1 NOT paired
      (4L, 4L, true),  // component root
      (5L, 4L, false)))
  }

  test("assignClusters: well-separated blobs get one cluster each, " +
    "deterministic for a seed") {
    val s = spark
    import s.implicits._
    // three tight, far-apart blobs — any non-degenerate Lloyd run at
    // k=3 separates them exactly
    val vecs = (0 until 30).map { i =>
      val blob = i % 3
      val base = Array(blob * 100f, blob * -50f)
      (i.toLong, Array(base(0) + (i / 3) * 0.01f,
        base(1) + (i / 3) * 0.01f), blob)
    }.toDF("vec_id", "embedding", "blob")
    val got = Similarity
      .assignClusters(vecs, "vec_id", "embedding", k = 3, seed = 7L)
      .select($"vec_id", $"blob", $"cluster_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // same blob → same cluster, different blobs → different clusters
    val byBlob = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byBlob.values.forall(_.size == 1), byBlob.toMap.toString)
    assert(byBlob.values.flatten.toSet.size == 3, byBlob.toMap.toString)
    // deterministic: a second run reproduces the assignment exactly
    val again = Similarity
      .assignClusters(vecs, "vec_id", "embedding", k = 3, seed = 7L)
      .select($"vec_id", $"cluster_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(again == got.map(t => (t._1, t._3)).toSeq)
  }

  test("semDedupAuto: recall vs label-clustered pairs on driver " +
    "embeddings; near-identical vectors always co-cluster") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def keptSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter($"is_kept").select($"vec_id").as[Long].collect().toSet
    def dupCount(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(!$"is_kept").count()
    val labeled = Similarity.semDedup(emb, "vec_id", "embedding",
      "label", tau = 0.3)
    val auto = Similarity.semDedupAuto(emb, "vec_id", "embedding",
      tau = 0.3, k = 10)
    val (nl, na) = (dupCount(labeled), dupCount(auto))
    // the label partition is NOT a geometric clustering, so the two
    // runs need not agree pair-for-pair; the guard is that the auto
    // pipeline finds a comparable amount of semantic duplication
    // (cluster-scoped recall), not ~zero
    assert(nl > 0, "fixture lost its planted near-dups")
    assert(na >= nl / 2,
      s"auto clustering found $na dups vs $nl with labels — recall collapsed")
    // and the keeper invariant holds: every component keeps min id
    val bad = auto.groupBy($"component_id")
      .agg(org.apache.spark.sql.functions.min($"vec_id").as("mn"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"is_kept", 1)
            .otherwise(0)).as("nk"))
      .filter($"mn" =!= $"component_id" || $"nk" =!= 1)
    assert(bad.count() == 0)
  }

  test("centroidSilhouette: hand-computed two-cluster value; " +
      "separation drives s toward 1; coincident clusters score 0") {
    val s = spark
    import s.implicits._
    def vecs(sep: Float) = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 2f), 0),
      (3L, Array(sep, 0f), 1), (4L, Array(sep, 2f), 1)
    ).toDF("vec_id", "embedding", "label")
    // centroids (0,1) and (10,1); every vector: a = 1, b = sqrt(101)
    val r10 = Similarity.centroidSilhouette(vecs(10f), "vec_id",
        "embedding", "label")
      .orderBy($"label").collect()
    val expect = (math.sqrt(101.0) - 1) / math.sqrt(101.0)
    r10.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == 2)
      assert(math.abs(r.getAs[Double]("mean_silhouette") - expect) < 1e-6)
    }
    // wider separation -> larger s
    val r100 = Similarity.centroidSilhouette(vecs(100f), "vec_id",
      "embedding", "label").select($"mean_silhouette")
      .as[Double].collect().head
    assert(r100 > expect)
    // coincident clusters: a == b -> s = 0
    val r0 = Similarity.centroidSilhouette(vecs(0f), "vec_id",
      "embedding", "label").select($"mean_silhouette")
      .as[Double].collect().toSeq
    assert(r0 == Seq(0.0, 0.0))
  }

  test("daviesBouldin: hand-computed two-cluster score; worse when " +
      "clusters approach; max picks the worst neighbor") {
    val s = spark
    import s.implicits._
    def vecs(sep: Float) = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 2f), 0),
      (3L, Array(sep, 0f), 1), (4L, Array(sep, 2f), 1)
    ).toDF("vec_id", "embedding", "label")
    // centroids (0,1), (10,1); scatter = 1 each; d = 10 → R = 0.2
    val r10 = Similarity.daviesBouldin(vecs(10f), "vec_id",
        "embedding", "label")
      .orderBy($"label").collect()
    r10.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == 2)
      assert(r.getAs[Double]("scatter") == 1.0)
      assert(r.getAs[Double]("db_score") == 0.2)
    }
    // closer clusters → higher (worse) score: d = 2 → R = 1.0
    val r2 = Similarity.daviesBouldin(vecs(2f), "vec_id",
      "embedding", "label").select($"db_score").as[Double].collect()
    assert(r2.toSeq == Seq(1.0, 1.0))
    // three clusters: the max ratio comes from the NEAREST/worst
    // neighbor (label 0 vs 1 at distance 2, not vs 2 at distance 100)
    val tri = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 2f), 0),
      (3L, Array(2f, 0f), 1), (4L, Array(2f, 2f), 1),
      (5L, Array(100f, 0f), 2), (6L, Array(100f, 2f), 2)
    ).toDF("vec_id", "embedding", "label")
    val r3 = Similarity.daviesBouldin(tri, "vec_id", "embedding", "label")
      .orderBy($"label").select($"db_score").as[Double].collect()
    assert(r3(0) == 1.0 && r3(1) == 1.0) // worst neighbor is the close one
    assert(r3(2) < 0.03) // far cluster: (1+1)/98 ≈ 0.0204
  }
}
