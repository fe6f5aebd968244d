package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 12: X164 positional phrase search. */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("phraseSearch finds exact adjacent sequences, counts " +
    "overlapping occurrences, and ignores bag-of-words matches") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the quick brown dog"),
      (2L, "quick the brown"),             // words present, order wrong
      (3L, "THE QUICK brown"),             // case-insensitive match
      (4L, "the slow brown fox"),          // gap breaks the phrase
      (5L, "a a a a"))                     // repeated-term stress
      .toDF("doc_id", "text")
    val out = InvertedIndex.phraseSearch(docs, "doc_id", "text",
        Seq("the", "quick", "brown"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(out == Map(1L -> (2L, 0L), 3L -> (1L, 0L)))
    // repeated-term phrase: "a a a" occurs at pos 0 and 1 in doc 5
    val rep = InvertedIndex.phraseSearch(docs, "doc_id", "text",
        Seq("a", "a", "a"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_matches")).toMap
    assert(rep == Map(5L -> 2L))
    // absent phrase -> empty result
    assert(InvertedIndex.phraseSearch(docs, "doc_id", "text",
      Seq("purple", "monkey")).count() == 0)
  }

  test("phraseSearch rejects single-word phrases") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseSearch(
        Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        Seq("x"))
    }
  }
}
