package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{PropertyHarness, SparkHarness}

/** WER semantics: hand-computed edit distances, edge conventions, and
  * the DP-kernel == char-mapped-levenshtein equivalence that powers
  * the q_wer oracle.
  */
class WerSpec extends AnyFunSuite with PropertyHarness {
  private lazy val spark = SparkHarness.spark

  test("editDistance: hand cases") {
    def d(a: String, b: String) =
      Wer.editDistance(a.split(" ").filter(_.nonEmpty).toIndexedSeq,
        b.split(" ").filter(_.nonEmpty).toIndexedSeq)
    assert(d("a b c", "a b c") == 0)
    assert(d("a b c", "a x c") == 1) // substitution
    assert(d("a b c", "a c") == 1)   // deletion
    assert(d("a c", "a b c") == 1)   // insertion
    assert(d("", "a b") == 2)
    assert(d("a b", "") == 2)
    assert(d("", "") == 0)
    // classic: kitten → sitting at word granularity
    assert(d("k i t t e n", "s i t t i n g") == 3)
  }

  test("wordErrorRate: per-row outputs and edge conventions") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, "a b c d", "a x c"),   // 1 sub + 1 del = 2, n_ref 4
      (2L, "a", "a"),             // perfect
      (3L, "", "a b")             // empty ref: dist 2, wer = 2/max(0,1)
    ).toDF("id", "ref", "hyp")
    val got = Wer.wordErrorRate(pairs, "id", "ref", "hyp")
      .orderBy($"id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.5), (2L, 1L, 0L, 0.0), (3L, 0L, 2L, 2.0)))
  }

  test("property: DP kernel == char-mapped levenshtein on random pairs") {
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val pairGen = for {
      nr <- Gen.choose(0, 12)
      nh <- Gen.choose(0, 12)
      r <- Gen.listOfN(nr, wordGen)
      h <- Gen.listOfN(nh, wordGen)
    } yield (r.mkString(" "), h.mkString(" "))
    forAllSampled(Gen.listOfN(8, pairGen), n = 6) { rows =>
      val df = rows.zipWithIndex
        .map { case ((r, h), i) => (i.toLong, r, h) }
        .toDF("id", "ref", "hyp")
      def res(f: org.apache.spark.sql.DataFrame) =
        f.collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val dp = res(Wer.wordErrorRate(df, "id", "ref", "hyp"))
      val cm = res(Wer.charMappedWer(df, "id", "ref", "hyp"))
      assert(dp == cm)
    }
  }

  test("charMappedWer: vocabulary cap trips loudly, ASCII bound enforced") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, "u v w x", "y z")).toDF("id", "ref", "hyp")
    val e = intercept[IllegalArgumentException] {
      Wer.charMappedWer(pairs, "id", "ref", "hyp", maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
    // codes past single-byte ASCII would silently diverge on
    // byte-based SQL levenshtein implementations — hard-capped
    val e2 = intercept[IllegalArgumentException] {
      Wer.charMappedWer(pairs, "id", "ref", "hyp", maxVocab = 200)
    }
    assert(e2.getMessage.contains("single-byte"))
  }

  test("null text behaves as empty on BOTH paths (DP == charMapped)") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, Option("a b"), Option.empty[String]),
      (2L, Option.empty[String], Option("x")),
      (3L, Option.empty[String], Option.empty[String])
    ).toDF("id", "ref", "hyp")
    val expected = Seq((1L, 2L, 2L, 1.0), (2L, 0L, 1L, 1.0),
      (3L, 0L, 0L, 0.0))
    val dp = Wer.wordErrorRate(pairs, "id", "ref", "hyp")
      .orderBy($"id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(dp == expected)
    // the mapped path must not drop the non-null side's words: a null
    // concat(__r, __h) would keep them out of the vocabulary and the
    // inner join would collapse dist to 0 where DP reports insertions
    val cm = Wer.charMappedWer(pairs, "id", "ref", "hyp")
      .orderBy($"id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(cm == expected)
  }
}
