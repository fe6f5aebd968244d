package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Contamination semantics on hand-built corpora: exact overlap
  * fractions, slot-vs-vocabulary denominators, short-doc totals.
  */
class ContaminationSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("flagContaminated: exact fractions, short docs report zero") {
    val s = spark
    import s.implicits._
    val bench = docs(100L -> "a b c d e f")        // grams: abc bcd cde def
    val corpus = docs(
      1L -> "a b c d x y z",   // 5 grams, 2 hits (abc bcd) → 0.4
      2L -> "p q r s t u",     // 4 grams, 0 hits
      3L -> "a b")             // < 3 tokens → 0 grams, total row kept
    val got = Contamination
      .flagContaminated(corpus, bench, "doc_id", "text", 3, 0.3)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_grams", $"n_hit", $"contamination", $"flagged")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 0.4, true),
      (2L, 4L, 0L, 0.0, false),
      (3L, 0L, 0L, 0.0, false)))
  }

  test("flagContaminated: denominator is the doc's DISTINCT grams") {
    val s = spark
    import s.implicits._
    // "a b a b a b": tokens ababab → 3-grams aba bab aba bab → 2 distinct
    val corpus = docs(1L -> "a b a b a b")
    val bench = docs(100L -> "a b a")
    val got = Contamination
      .flagContaminated(corpus, bench, "doc_id", "text", 3, 0.5)
      .select($"n_grams", $"n_hit").as[(Long, Long)].head()
    assert(got == ((2L, 1L))) // {aba, bab}; aba hits
  }

  test("duplicateSpanCoverage: slots counted with multiplicity") {
    val s = spark
    import s.implicits._
    val corpus = docs(
      1L -> "a b c d e",   // grams abc bcd cde (3 slots)
      2L -> "a b c x y",   // grams abc bcx cxy
      3L -> "a b c a b c") // grams abc bca cab abc — abc twice
    val got = Contamination
      .duplicateSpanCoverage(corpus, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_pos", $"n_dup").as[(Long, Long, Long)]
      .collect().toSeq
    // only "abc" crosses docs (df=3); doc 3 has it in 2 of 4 slots
    assert(got == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 2L)))
  }

  test("duplicateSpanCoverage: doc repeating a gram only internally") {
    val s = spark
    import s.implicits._
    // "x y x y x y" repeats gram xyx/yxy internally, but no other doc
    // shares them → df=1, coverage 0 (cross-doc semantics, not
    // intra-doc repetition — that's repetitionStats' job)
    val corpus = docs(1L -> "x y x y x y", 2L -> "p q r s t")
    val cov = Contamination
      .duplicateSpanCoverage(corpus, "doc_id", "text", 3)
      .filter($"doc_id" === 1).select($"coverage").as[Double].head()
    assert(cov == 0.0)
  }

  test("repetitionStats: exact ratios on a hand doc") {
    val s = spark
    import s.implicits._
    // tokens: a a a b (4 tokens, 2 distinct, top=3)
    // bigrams: "a a","a a","a b" (3 total, 2 distinct)
    val got = CorpusOps
      .repetitionStats(docs(1L -> "A a a b"), "doc_id", "text")
      .select($"n_tokens", $"n_distinct", $"ttr", $"top_frac",
        $"dup_bigram_frac")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((4L, 2L, 0.5, 0.75, 1.0 - 2.0 / 3.0)))
  }

  test("repetitionStats: single-token doc has zero dup_bigram_frac") {
    val s = spark
    import s.implicits._
    val got = CorpusOps.repetitionStats(docs(1L -> "only"), "doc_id", "text")
      .select($"n_tokens", $"ttr", $"dup_bigram_frac")
      .as[(Long, Double, Double)].head()
    assert(got == ((1L, 1.0, 0.0)))
  }

  test("deterministicShuffle: total, reproducible, positions dense") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i.toLong, i.toString))
      .toDF("id", "k")
    val a = CorpusOps.deterministicShuffle(df, "k", 8, "s")
      .select($"id", $"shard", $"pos")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val b = CorpusOps.deterministicShuffle(df, "k", 8, "s")
      .select($"id", $"shard", $"pos")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(a == b) // reproducible
    assert(a.map(_._1).toSet.size == 500) // total, no row lost
    // per-shard positions are 1..n dense
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toList)
    }
    // roughly uniform shards (8 shards × ~62)
    val sizes = a.groupBy(_._2).values.map(_.size)
    assert(sizes.size == 8 && sizes.min > 30 && sizes.max < 100)
    // different salt ⇒ different order
    val c = CorpusOps.deterministicShuffle(df, "k", 8, "t")
      .select($"id", $"shard", $"pos")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(a != c)
  }

  test("deterministicShuffle: order stable under corpus growth") {
    val s = spark
    import s.implicits._
    val df = (0 until 300).map(i => (i.toLong, i.toString)).toDF("id", "k")
    val grown = (0 until 400).map(i => (i.toLong, i.toString)).toDF("id", "k")
    def order(res: org.apache.spark.sql.DataFrame, ids: Set[Long]) =
      res.select($"id", $"shard", $"pos").as[(Long, Int, Int)]
        .collect().filter(r => ids(r._1))
        .groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    val base = order(CorpusOps.deterministicShuffle(df, "k", 4, "s"),
      (0L until 300L).toSet)
    val after = order(CorpusOps.deterministicShuffle(grown, "k", 4, "s"),
      (0L until 300L).toSet)
    // within every shard, the relative order of surviving docs is
    // unchanged by adding new docs (hash-stable shuffle)
    assert(base == after)
  }

  test("removeDuplicateSpans: cross-doc slots cut, within-doc repeats kept") {
    val s = spark
    import s.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val corpus = docs(
      1L -> "a b c d",   // slots "a b" | "c d"; "a b" shared with 2, 4
      2L -> "a b x y",   // slots "a b" | "x y"
      3L -> "z z",       // unique slot survives whole
      4L -> "a b",       // single slot shared → cleaned to empty
      5L -> "q r q r")   // same span TWICE in ONE doc → not cross-doc → kept
    val got = Contamination
      .removeDuplicateSpans(corpus, "doc_id", "text", spanLen = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_slots", $"n_dropped", $"clean_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, md5hex("c d")),
      (2L, 2L, 1L, md5hex("x y")),
      (3L, 1L, 0L, md5hex("z z")),
      (4L, 1L, 1L, md5hex("")),
      (5L, 2L, 0L, md5hex("q r q r"))))
  }

  test("removeDuplicateSpans: tail slot is its own span, alignment matters") {
    val s = spark
    import s.implicits._
    // doc 1 tail "e" and doc 2 slot "e f" differ → no cut despite the
    // shared token; doc 2/3 share the aligned slot "e f" → cut.
    val corpus = docs(
      1L -> "p q r s e",
      2L -> "e f m n",
      3L -> "e f w w")
    val got = Contamination
      .removeDuplicateSpans(corpus, "doc_id", "text", spanLen = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_slots", $"n_dropped")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("anyOffset: planted MID-SLOT duplicate removed (the X62 miss), " +
    "exact survivors") {
    val s = spark
    import s.implicits._
    // the duplicated 3-token passage "d1 d2 d3" starts at offset 2 in
    // doc 1 and offset 0 in doc 2 — slot-aligned dedup at spanLen=3
    // sees different slot texts and keeps both; any-offset cuts both
    val corpus = docs(
      1L -> "u1 u2 d1 d2 d3 u3",
      2L -> "d1 d2 d3 v1 v2 v3")
    val aligned = Contamination
      .removeDuplicateSpans(corpus, "doc_id", "text", spanLen = 3)
      .orderBy($"doc_id")
      .select($"n_dropped").as[Long].collect().toSeq
    assert(aligned == Seq(0L, 0L), "slot-aligned form misses the plant")
    val got = Contamination
      .removeDuplicateSpansAnyOffset(corpus, "doc_id", "text", k = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 3L, md5hex("u1 u2 u3")),
      (2L, 6L, 3L, md5hex("v1 v2 v3"))))
  }

  test("anyOffset: maximal run wider than k fully cut; within-doc " +
    "repeats kept; short/empty docs total") {
    val s = spark
    import s.implicits._
    val corpus = docs(
      1L -> "a b c d e x1",     // run a..e (5 tokens) duplicated in 2
      2L -> "y1 a b c d e",     // → every token of the run covered
      3L -> "p q p q",          // within-doc repeat only → kept
      4L -> "s t")              // shorter than k → no grams → kept
    val got = Contamination
      .removeDuplicateSpansAnyOffset(corpus, "doc_id", "text", k = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 5L, md5hex("x1")),
      (2L, 6L, 5L, md5hex("y1")),
      (3L, 4L, 0L, md5hex("p q p q")),
      (4L, 2L, 0L, md5hex("s t"))))
    // a doc with k=3 and only 2 tokens has zero grams at k=3 too
    val short = Contamination
      .removeDuplicateSpansAnyOffset(corpus, "doc_id", "text", k = 3)
      .filter($"doc_id" === 4L)
      .as[(Long, Long, Long, String)].collect().head
    assert(short == ((4L, 2L, 0L, md5hex("s t"))))
  }

  test("memorizationScan: self-matches excluded, cross-doc verbatim " +
      "counted, short candidates score 0/0") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> "a b c d e f",   // candidate: "a b c" also in doc 3
      2L -> "u v w x y z",   // candidate: fully unique
      3L -> "q a b c r s",   // plants doc 1's prefix
      4L -> "m n"            // candidate shorter than k=3
    ).toDF("doc_id", "text")
    val cands = corpus.filter($"doc_id" isin (1L, 2L, 4L))
    val got = Contamination
      .memorizationScan(corpus, cands, "doc_id", "text", k = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1 grams: [a b c][b c d][c d e][d e f] -> only "a b c" is in
    // doc 3 -> 1/4; doc 2: 0/4; doc 4: no grams
    assert(got == Seq(
      (1L, 4L, 1L, 0.25),
      (2L, 4L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
    // a doc duplicated verbatim elsewhere scores 1.0
    val corpus2 = corpus.union(Seq(5L -> "a b c d e f").toDF("d", "t"))
    val full = Contamination
      .memorizationScan(corpus2, corpus2.filter($"doc_id" === 1L),
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Double)].collect().head
    assert(full == ((1L, 4L, 4L, 1.0)))
  }

  test("ngramNovelty: hand-computed novelty@n, holdout-only grams") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "train", "a b c"),
      (2L, "train", "a b"),
      (3L, "hold", "a b d")
    ).toDF("doc_id", "split", "text")
    val r = Contamination.ngramNovelty(docs, "doc_id", "text",
        isHoldout = $"split" === "hold", maxN = 2)
      .orderBy($"n")
      .as[(Int, Long, Long, Double)].collect().toSeq
    // unigrams in holdout: {a, b, d}; d unseen in train → 1/3
    // bigrams in holdout: {a·b, b·d}; b·d unseen → 1/2
    assert(r == Seq((1, 3L, 1L, 0.333333), (2, 2L, 1L, 0.5)))
    // fully novel holdout
    val r2 = Contamination.ngramNovelty(docs, "doc_id", "text",
        isHoldout = $"doc_id" === 99L, maxN = 2) // empty holdout
      .collect()
    assert(r2.isEmpty)
  }
}
