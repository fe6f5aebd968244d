package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** RRF fusion semantics on literal ranked lists. */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("rrf: hand-computed fusion, missing-list contributes zero") {
    val s = spark
    import s.implicits._
    // lexical: A=1, B=2, C=3; vector: B=1, D=2
    val lex = Seq(("A", 1), ("B", 2), ("C", 3)).toDF("id", "rank")
    val vec = Seq(("B", 1), ("D", 2)).toDF("id", "rank")
    val got = HybridSearch.rrf(Seq(lex, vec), "id", k = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
      .sortBy(_._3)
    def c(r: Int) = 1.0 / (60 + r)
    // B fuses both lists and must rank first
    assert(got.map(_._1).toSeq == Seq("B", "A", "D", "C"))
    assert(math.abs(got(0)._2 - (c(2) + c(1))) < 1e-12)
    assert(math.abs(got(1)._2 - c(1)) < 1e-12)
    assert(math.abs(got(2)._2 - c(2)) < 1e-12)
    assert(math.abs(got(3)._2 - c(3)) < 1e-12)
  }

  test("rrf: equal scores tie-break on id; k truncates") {
    val s = spark
    import s.implicits._
    // two items with identical single-list rank -> equal score
    val l1 = Seq(("Z", 1)).toDF("id", "rank")
    val l2 = Seq(("M", 1)).toDF("id", "rank")
    val got = HybridSearch.rrf(Seq(l1, l2), "id", k = 1)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(got.toSeq == Seq(("M", 1))) // id asc wins the tie, k=1 cuts Z
  }
}
