package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.Dedup

/** `shingle_hash64` must be set-equivalent to the readable string
  * -shingle pipeline (`Dedup.shingles` over `Dedup.tokens`): same
  * cardinality per doc, same equality structure across docs — those
  * are the only properties the dedup operators consume.
  */
class ShingleHashExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "the quick brown fox jumps over the lazy dog", // dup of row 0
    "  spaced   out\ttokens \n with   gaps  ",
    "short one", // fewer tokens than k -> empty
    "repeat repeat repeat repeat repeat repeat", // one distinct shingle
    "")

  private val K = 4

  private def df = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("per-doc cardinality matches the string-shingle pipeline") {
    val s = spark
    import s.implicits._
    val got = df.select($"id",
        size(Dedup.hashedShingles($"text", K)).as("nh"),
        size(Dedup.shingles(Dedup.tokens($"text"), K)).as("ns"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}"))
  }

  test("identical texts produce identical shingle sets; different differ") {
    val s = spark
    import s.implicits._
    val sets = df.select($"id",
        array_sort(Dedup.hashedShingles($"text", K)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sets(0L) == sets(2L))
    assert(sets(0L) != sets(1L))
    // the differing token is the LAST of 9 at k=4, so it appears in
    // exactly one shingle: intersection misses exactly 1
    assert(sets(0L).toSet.intersect(sets(1L).toSet).size == sets(0L).size - 1)
  }

  test("whitespace runs and empty tokens are skipped like the tokenizer") {
    val s = spark
    import s.implicits._
    val n = df.filter($"id" === 3L)
      .select(size(Dedup.hashedShingles($"text", K))).collect()(0).getInt(0)
    assert(n == 2) // 5 tokens -> 2 four-gram shingles
  }

  test("degenerate inputs: short and empty texts give empty arrays") {
    val s = spark
    import s.implicits._
    val got = df.filter($"id".isin(4L, 6L))
      .select(size(Dedup.hashedShingles($"text", K))).collect()
    got.foreach(r => assert(r.getInt(0) == 0))
  }

  test("usable from spark.sql text") {
    val n = spark.sql(
      "SELECT size(shingle_hash64(split('a b c d e', ' '), 4)) AS n")
      .collect()(0).getInt(0)
    assert(n == 2)
  }

  test("property: cardinality == string pipeline on random texts") {
    val s = spark
    import org.scalacheck.Gen
    import s.implicits._
    val word = Gen.chooseNum(0, 40).map(i => s"t$i")
    val text = for {
      n <- Gen.chooseNum(0, 60)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val harness = new graft.PropertyHarness {}
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    harness.forAllSampled(text, 120)(t => texts += t)
    for (k <- Seq(2, 4)) {
      val got = texts.toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select($"id",
          size(Dedup.hashedShingles($"text", k)).as("nh"),
          size(Dedup.shingles(Dedup.tokens($"text"), k)).as("ns"))
        .collect()
      got.foreach(r =>
        assert(r.getInt(1) == r.getInt(2), s"k=$k id=${r.getLong(0)}"))
    }
  }
}
