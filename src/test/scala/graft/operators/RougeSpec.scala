package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** ROUGE-L: the LCS DP against textbook values (including crossing
  * matches a greedy matcher mishandles), and the DataFrame metric
  * end-to-end with hand-computed P/R/F1.
  */
class RougeSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def lcs(a: String, b: String): Int =
    Rouge.lcsLength(a.split(" ").toIndexedSeq, b.split(" ").toIndexedSeq)

  test("lcsLength: textbook values, crossing matches, degenerate inputs") {
    // the classic CLRS example: LCS(ABCBDAB, BDCABA) = 4 (BCBA)
    assert(lcs("A B C B D A B", "B D C A B A") == 4)
    // crossing blocks: a greedy longest-block matcher sees 1+1, the
    // true DP scans both interleavings
    assert(lcs("a b c d", "c d a b") == 2)
    assert(lcs("x y", "y x") == 1)
    // identity / disjoint / empty
    assert(lcs("p q r", "p q r") == 3)
    assert(lcs("p q r", "s t u") == 0)
    assert(Rouge.lcsLength(IndexedSeq.empty, IndexedSeq("a")) == 0)
    assert(Rouge.lcsLength(IndexedSeq("a"), IndexedSeq.empty) == 0)
  }

  test("rougeL: hand-computed precision/recall/F1, empty-side zeros") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat on the mat"), // LCS 5
      (2L, "a b c", ""),                                    // empty hyp
      (3L, "", "x y"),                                      // empty ref
      (4L, "w1 w2", "w3 w4")                                // disjoint
    ).toDF("id", "ref_text", "hyp_text")
    val r = Rouge.rougeL(pairs, "id", "ref_text", "hyp_text")
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val p = 5.0 / 5; val rc = 5.0 / 6
    assert(r(0) == ((1L, 6L, 5L, 5L, r6(p), r6(rc),
      r6(2.0 * p * rc / (p + rc)))))
    assert(r(1) == ((2L, 3L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(r(2) == ((3L, 0L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(r(3) == ((4L, 2L, 2L, 0L, 0.0, 0.0, 0.0)))
  }
}
