package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 2: X142 blocklist filter, X143 label propagation,
  * X144 NDCG@k.
  */
class CurationWave9Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // ---- X142 blocklistFilter ------------------------------------------

  test("blocklistFilter counts every occurrence of every phrase " +
    "length, overlaps included, and gates on density") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "bad word here bad word bad"),   // "bad word" x2, "bad" x3
      (2L, "all clean text in this doc"),
      (3L, "")).toDF("doc_id", "text")
    val out = CorpusOps.blocklistFilter(docs, "doc_id", "text",
        phrases = Seq("bad", "bad word"), maxRatio = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_matches") == 5L) // 3 + 2
    assert(out(1L).getAs[Long]("n_tokens") == 6L)
    assert(!out(1L).getAs[Boolean]("keep")) // 5/6 > 0.5
    assert(out(2L).getAs[Long]("n_matches") == 0L)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Long]("n_tokens") == 0L)
    assert(out(3L).getAs[Boolean]("keep")) // empty doc: ratio 0
  }

  test("blocklistFilter matches case-insensitively on normalized tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "Bad WORD")).toDF("doc_id", "text")
    val out = CorpusOps.blocklistFilter(docs, "doc_id", "text",
      phrases = Seq("BAD word"), maxRatio = 0.1).head()
    assert(out.getAs[Long]("n_matches") == 1L)
  }

  // ---- X143 labelPropagation -----------------------------------------

  test("labelPropagation: a path graph floods from the seed; ties " +
    "choose the smallest label; seeds stay clamped") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4 symmetrized; seed node1=7
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 7L)).toDF("node", "seed")
    val out = PageRank.labelPropagation(edges, "src", "dst", seeds,
        "node", "seed", iters = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Long]("label")))).toMap
    assert(out(1L).contains(7L) && out(2L).contains(7L) &&
      out(3L).contains(7L) && out(4L).contains(7L))
    // two competing seeds, equidistant center: smallest label wins
    val e1 = Seq((1L, 2L), (3L, 2L))
    val edges2 = (e1 ++ e1.map(_.swap)).toDF("src", "dst")
    val seeds2 = Seq((1L, 9L), (3L, 4L)).toDF("node", "seed")
    val out2 = PageRank.labelPropagation(edges2, "src", "dst", seeds2,
        "node", "seed", iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label"))
      .toMap
    assert(out2(2L) == 4L) // tie between 9 and 4 -> smaller
    assert(out2(1L) == 9L && out2(3L) == 4L) // clamped
  }

  test("labelPropagation: unreached nodes stay unlabeled") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 3L)).toDF("node", "seed")
    val out = PageRank.labelPropagation(edges, "src", "dst", seeds,
        "node", "seed", iters = 4)
      .collect().map(r => r.getAs[Long]("node") -> r.isNullAt(1)).toMap
    assert(!out(1L) && !out(2L)) // labeled component
    assert(out(5L) && out(6L))   // disconnected component: null
  }

  // ---- X144 ndcgAtK --------------------------------------------------

  test("ndcgAtK: perfect ordering scores 1, reversed ordering scores " +
    "the hand-computed value, no-relevant is NULL") {
    val s = spark
    import s.implicits._
    val ranked = Seq(
      // q1: rels (1, 1, 0) in rank order — ideal — ndcg 1
      (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L),
      // q2: rels (0, 0, 1) — worst placement of one relevant
      (2L, 1, 0L), (2L, 2, 0L), (2L, 3, 1L),
      // q3: nothing relevant
      (3L, 1, 0L), (3L, 2, 0L))
      .toDF("query_id", "rank", "rel")
    val out = RankEval.ndcgAtK(ranked, "query_id", "rank", "rel", k = 5)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Double]("ndcg") == 1.0)
    // q2: DCG = 1/log2(4); IDCG = 1/log2(2) = 1 -> ndcg = 0.5
    assert(math.abs(out(2L).getAs[Double]("ndcg") - 0.5) < 1e-9)
    assert(out(3L).isNullAt(out(3L).fieldIndex("ndcg")))
    assert(out(2L).getAs[Long]("n_relevant") == 1L)
  }

  test("ndcgAtK: graded gains use 2^rel - 1 and respect the k cutoff") {
    val s = spark
    import s.implicits._
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 3L), (1L, 3, 2L), (1L, 4, 3L))
      .toDF("query_id", "rank", "rel")
    val out = RankEval.ndcgAtK(ranked, "query_id", "rank", "rel", k = 3)
      .head()
    assert(out.getAs[Long]("n_ranked") == 3L) // rank 4 cut
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 1.0 / l2(2) + 7.0 / l2(3) + 3.0 / l2(4)
    val idcg = 7.0 / l2(2) + 3.0 / l2(3) + 1.0 / l2(4)
    assert(math.abs(out.getAs[Double]("ndcg") -
      math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
  }
}
