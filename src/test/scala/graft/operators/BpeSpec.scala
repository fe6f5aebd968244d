package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** BPE merge training: hand-computed merge sequence, deterministic
  * tie-break, early stop, and encode round-trip.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("trainOnWordTable: hand-computed merges, tie-break, early stop") {
    // words: aaab ×2, ab ×3
    // iter0: (a,a)=4, (a,b)=5 → merge (a,b)
    // iter1: (a,a)=2, (a,ab)=2 → tie → (a,a) lexicographically first
    // iter2: (aa,ab)=2 → merge
    // iter3: no pairs left → stop at 3 despite numMerges=5
    val table = Array(
      (Array("a", "a", "a", "b"), 2L),
      (Array("a", "b"), 3L))
    val merges = Bpe.trainOnWordTable(table, numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("a", "b", 5L), ("a", "a", 2L), ("aa", "ab", 2L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2))
  }

  test("trainMerges: distributed word table matches the local loop; " +
    "encode round-trips trained words") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "ab ab aaab"), (2L, "ab aaab")).toDF("doc_id", "text")
    // word counts: ab=3, aaab=2 — identical to the hand table above
    val merges = Bpe.trainMerges(docs, "text", numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("a", "b", 5L), ("a", "a", 2L), ("aa", "ab", 2L)))
    // training words reach their trained segmentation
    assert(Bpe.encodeWord("aaab", merges) == Seq("aaab"))
    assert(Bpe.encodeWord("ab", merges) == Seq("ab"))
    // unseen word: merges apply where they fit, rest stays chars
    assert(Bpe.encodeWord("aab", merges) == Seq("a", "ab"))
    assert(Bpe.encodeWord("ba", merges) == Seq("b", "a"))
  }

  test("minCount prunes the Zipf tail before the collect, under a " +
    "vocabulary cap the raw corpus exceeds") {
    val s = spark
    import s.implicits._
    // 20 hapax words (the "web-corpus tail") + 2 repeated words: the
    // raw vocabulary (22 types) exceeds maxVocab=10 and must fail
    // loudly; minCount=2 drops the tail distributed-side and trains
    // on the 2 surviving types
    val tail = (0 until 20).map(i => f"tail$i%02d").mkString(" ")
    val docs = Seq((1L, s"ab ab aaab $tail"), (2L, "ab aaab"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Bpe.trainMerges(docs, "text", numMerges = 5, maxVocab = 10))
    assert(e.getMessage.contains("minCount"))
    val merges = Bpe.trainMerges(docs, "text", numMerges = 5,
      maxVocab = 10, minCount = 2)
    // same word table as the unfiltered small corpus: ab=3, aaab=2
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("a", "b", 5L), ("a", "a", 2L), ("aa", "ab", 2L)))
  }

  test("encodeDocs: per-doc symbols match encodeWord; null/empty text; " +
    "decode identity") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Option("ab ab aaab")),
      (2L, Option("AAB ba")),   // case-folds like Dedup.tokens
      (3L, Option.empty[String]),
      (4L, Option(""))
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 5)
    val got = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .orderBy($"doc_id")
      .as[(Long, Long, String)].collect().toSeq
    def enc(ws: String*) = {
      val parts = ws.map(w => Bpe.encodeWord(w, merges))
      (parts.map(_.size.toLong).sum, parts.map(_.mkString(" ")).mkString(" "))
    }
    val d1 = enc("ab", "ab", "aaab")
    val d2 = enc("aab", "ba")
    assert(got == Seq(
      (1L, d1._1, d1._2),
      (2L, d2._1, d2._2),
      (3L, 0L, ""),
      (4L, 0L, "")))
    // decode identity: stripping the symbol separators reproduces the
    // normalized text (merges only ever join adjacent symbols)
    assert(got(0)._3.replace(" ", "") == "ababaaab")
    assert(got(1)._3.replace(" ", "") == "aabba")
  }

  test("trainMerges: maxVocab guard trips loudly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "u v w x y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, "text", numMerges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  // ---- X121 WordPiece greedy encode ---------------------------------

  test("wordpiece: greedy longest-match with ## continuations") {
    val s = SparkHarness.spark
    import s.implicits._
    // corpus: (a,b) wins the single merge -> vocab {a, b, ab}
    val docs = Seq((1L, "aba ab a b"), (2L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
    val out = Bpe.wordpieceEncodeDocs(docs, "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "aba" -> ab + ##a, "ab" -> ab, "a" -> a, "b" -> b
    assert(out(1L).getAs[String]("enc_text") == "ab ##a ab a b")
    assert(out(1L).getAs[Long]("n_pieces") == 5L)
    assert(out(2L).getAs[String]("enc_text") == "ab ab")
    // piece count always equals the space-split length of enc_text
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_pieces") ==
        r.getAs[String]("enc_text").split(" ").count(_.nonEmpty).toLong)
    }
  }

  test("vocabSweep: compression is monotone in merge count and the " +
    "largest point matches a direct encode") {
    val s = SparkHarness.spark
    import s.implicits._
    val docs = Seq((1L, "low lower lowest low low low"),
      (2L, "newest widest lowest low")).toDF("doc_id", "text")
    val sweep = Bpe.vocabSweep(docs, "text", Seq(1, 4, 8))
      .orderBy($"n_merges").collect()
    assert(sweep.map(_.getAs[Int]("n_merges")).toSeq == Seq(1, 4, 8))
    val tpw = sweep.map(_.getAs[Double]("tokens_per_word"))
    assert(tpw.zip(tpw.tail).forall { case (a, b) => a >= b },
      s"not monotone: ${tpw.toSeq}")
    // prefix property: the k=8 sweep point equals encoding the corpus
    // with the full 8-merge table
    val merges = Bpe.trainMerges(docs, "text", numMerges = 8)
    val direct = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).collect()
      .head.getLong(0)
    assert(sweep.last.getAs[Long]("total_tokens") == direct)
  }

  test("wordpiece: deterministic across repartitionings") {
    val s = SparkHarness.spark
    import s.implicits._
    val docs = (1L to 30L).map(i => (i, s"low lower lowest w$i low"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 8)
    val a = Bpe.wordpieceEncodeDocs(docs, "doc_id", "text", merges)
      .orderBy($"doc_id").collect().toSeq
    val b = Bpe.wordpieceEncodeDocs(docs.repartition(7), "doc_id", "text",
      merges).orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }
}
