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

  test("trainMerges: maxVocab guard trips loudly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "u v w x y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, "text", numMerges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
  }
}
