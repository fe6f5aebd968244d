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

  // ---- X145 minhashSketch --------------------------------------------

  test("minhashSketch: part-union equals the whole-corpus signature " +
    "exactly (slot-wise min merge law)") {
    val s = spark
    import s.implicits._
    val docs = (0 until 60).map { i =>
      (i.toLong, "s" + (i % 3),
        (0 until 20).map(j => s"w${(i * 7 + j) % 25}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val whole = Dedup.minhashSketch(docs, "source", "text", slots = 16)
    val partA = Dedup.minhashSketch(docs.filter($"doc_id" % 2 === 0),
      "source", "text", slots = 16)
    val partB = Dedup.minhashSketch(docs.filter($"doc_id" % 2 === 1),
      "source", "text", slots = 16)
    val merged = Dedup.mergeMinhash(partA, partB)
    val w = whole.orderBy($"key", $"slot").collect().map(_.toSeq).toSeq
    val m = merged.orderBy($"key", $"slot").collect().map(_.toSeq).toSeq
    assert(w == m)
  }

  test("minhashSketch estimates track exact Jaccard within sketch " +
    "error; identical keys estimate 1.0") {
    val s = spark
    import s.implicits._
    // two sources with identical text -> J = 1; one disjoint
    val docs = Seq(
      (1L, "a", "tok1 tok2 tok3 tok4 tok5 tok6"),
      (2L, "b", "tok1 tok2 tok3 tok4 tok5 tok6"),
      (3L, "c", "zed1 zed2 zed3 zed4 zed5 zed6"))
      .toDF("doc_id", "source", "text")
    val est = Dedup.minhashJaccard(
      Dedup.minhashSketch(docs, "source", "text", slots = 32))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(est(("a", "b")).getAs[Double]("est_jaccard") == 1.0)
    assert(est(("a", "c")).getAs[Double]("est_jaccard") == 0.0)
  }

  // ---- X146 readability ----------------------------------------------

  test("readability: hand-computed Flesch on a known sentence") {
    val s = spark
    import s.implicits._
    // "the cat sat. it sat there!" -> 6 words, 2 sentences,
    // syllables: the(1) cat(1) sat.(1) it(1) sat(1) there!(2... 'e','e'
    //   -> groups in "there!": 'e','e' = 2) = 7
    val docs = Seq((1L, "the cat sat. it sat there!"))
      .toDF("doc_id", "text")
    val r = CorpusOps.readability(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 7L)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    val flesch = 206.835 - 1.015 * wps - 84.6 * spw
    assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-5)
    val fk = 0.39 * wps + 11.8 * spw - 15.59
    assert(math.abs(r.getAs[Double]("fk_grade") - fk) < 1e-5)
  }

  test("readability: empty doc floors sentences at 1 and zeroes the " +
    "syllable ratio") {
    val s = spark
    import s.implicits._
    val r = CorpusOps.readability(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.getAs[Long]("n_syllables") == 0L)
    assert(r.getAs[Double]("flesch") == 206.835)
  }

  // ---- X147 rocAuc ---------------------------------------------------

  test("rocAuc: separation 1.0, reversal 0.0, all-tied 0.5, hand case") {
    val s = spark
    import s.implicits._
    def auc(rows: Seq[(Long, Boolean)]): Option[Double] = {
      val r = RankEval.rocAuc(rows.toDF("score", "label"),
        "score", "label").head()
      if (r.isNullAt(r.fieldIndex("auc"))) None
      else Some(r.getAs[Double]("auc"))
    }
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
      .contains(1.0))
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false)))
      .contains(0.0))
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false)))
      .contains(0.5))
    // hand: pos scores {2, 3}, neg {1, 3}: pairs (2>1)=1, (2,3)=0,
    // (3>1)=1, (3,3)=.5 -> U=2.5 / 4 = 0.625
    assert(auc(Seq((2L, true), (3L, true), (1L, false), (3L, false)))
      .contains(0.625))
    // degenerate: one class only -> NULL
    assert(auc(Seq((1L, true), (2L, true))).isEmpty)
  }

  // ---- X148 cohensKappa ----------------------------------------------

  test("cohensKappa: perfect agreement is 1, hand-computed 2x2 case " +
    "matches the textbook value") {
    val s = spark
    import s.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("a", "b")
    val rp = RankEval.cohensKappa(perfect, "a", "b").head()
    assert(rp.getAs[Double]("kappa") == 1.0)
    // textbook 2x2: cells (yes,yes)=20, (yes,no)=5, (no,yes)=10,
    // (no,no)=15 -> po=35/50=0.7, pe=(25*30 + 25*20)/2500=0.5,
    // kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = RankEval.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_items") == 50L)
    assert(math.abs(r.getAs[Double]("observed_agreement") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("expected_agreement") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)
  }
}
