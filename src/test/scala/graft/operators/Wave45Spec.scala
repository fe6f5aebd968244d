package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 45 (X353–X356): filter ablation matrix, boilerplate prefix
  * templates, NFC normalization audit, source style cosine.
  */
class Wave45Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X353 filterAblation -------------------------------------------

  test("filterAblation: hand-counted kill overlap and Jaccard") {
    // doc lengths: 5, 15, 25, 35; gates: <20 kills {5,15}, <30 kills
    // {5,15,25} -> both {5,15}, jaccard 2/3
    val docs = Seq(5, 15, 25, 35).map(_.toLong).toDF("len")
    val out = CorpusOps.filterAblation(docs, Seq(
      "a_lt20" -> ($"len" < 20), "b_lt30" -> ($"len" < 30)))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_docs") == 4)
    assert(r.getAs[Long]("n_killed_a") == 2 &&
      r.getAs[Long]("n_killed_b") == 3)
    assert(r.getAs[Long]("n_killed_both") == 2)
    assert(r.getAs[Double]("kill_jaccard") == 0.666667)
  }

  test("filterAblation: disjoint gates read Jaccard 0; gate-name " +
    "hygiene enforced") {
    val docs = Seq(5L, 35L).toDF("len")
    val r = CorpusOps.filterAblation(docs, Seq(
      "lo" -> ($"len" < 10), "hi" -> ($"len" > 30))).collect()(0)
    assert(r.getAs[Long]("n_killed_both") == 0 &&
      r.getAs[Double]("kill_jaccard") == 0.0)
    intercept[IllegalArgumentException] {
      CorpusOps.filterAblation(docs, Seq("bad name" -> ($"len" < 10),
        "ok" -> ($"len" > 0)))
    }
  }

  // ---- X354 prefixTemplates ------------------------------------------

  test("prefixTemplates: shared prefixes group, short docs use their " +
    "whole text, shares divide by the corpus") {
    val docs = Seq("terms of service apply here", "terms of service x",
      "terms of service", "unique words only", "of")
      .toDF("text")
    val out = CorpusOps.prefixTemplates(docs, "text", k = 3, topN = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out("terms of service") == ((3L, 0.6)))
    assert(out("unique words only") == ((1L, 0.2)))
    assert(out("of") == ((1L, 0.2))) // shorter than k: whole text
  }

  // ---- X355 nfcAudit ---------------------------------------------------

  test("nfcAudit: decomposed accents flag, precomposed and ASCII " +
    "pass") {
    val docs = Seq(("s1", "plain ascii"), ("s1", "café"),
      ("s1", "café"), ("s2", "all clean")).toDF("source", "text")
    val out = CorpusOps.nfcAudit(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((3L, 1L, 0.333333)))
    assert(out("s2") == ((1L, 0L, 0.0)))
  }

  // ---- X356 sourceStyleCosine ------------------------------------------

  test("sourceStyleCosine: identical text gives cosine 1, disjoint " +
    "trigrams give no shared basis mass") {
    val docs = Seq(("a", "abcdefgh"), ("b", "abcdefgh"),
      ("c", "zzzzyyyy")).toDF("source", "text")
    val out = CorpusOps.sourceStyleCosine(docs, "source", "text",
        m = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(out(("a", "b")) == 1.0)
    // a and c share zero trigrams: the pair has no dot row at all
    assert(!out.contains(("a", "c")))
  }

  test("sourceStyleCosine: hand-computed two-gram-overlap cosine") {
    // a: "ababa" -> trigrams aba,bab,aba => {aba:2, bab:1}
    // b: "abab"  -> aba,bab             => {aba:1, bab:1}
    // cos = (2+1)/(sqrt(5)*sqrt(2)) = 3/sqrt(10) = 0.948683
    val docs = Seq(("a", "ababa"), ("b", "abab")).toDF("source", "text")
    val r = CorpusOps.sourceStyleCosine(docs, "source", "text", m = 50)
      .collect()(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getDouble(2) == 0.948683)
  }
}
