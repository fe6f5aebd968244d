package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{PropertyHarness, SparkHarness}

/** Myers bit-parallel Levenshtein: exact equality with the classic
  * DP (the definition) across sizes, block boundaries, alphabets —
  * and with Spark's built-in on ASCII.
  */
class EditDistanceSpec extends AnyFunSuite with PropertyHarness {

  private def d(a: String, b: String): Int =
    EditDistance.levenshteinFast(a, b)
  private def ref(a: String, b: String): Int =
    EditDistance.classic(a.codePoints().toArray, b.codePoints().toArray)

  test("edges: empty, equal, disjoint, single char") {
    assert(d("", "") == 0)
    assert(d("", "abc") == 3)
    assert(d("abc", "") == 3)
    assert(d("abc", "abc") == 0)
    assert(d("abc", "xyz") == 3)
    assert(d("a", "b") == 1)
    assert(d("kitten", "sitting") == 3)
  }

  test("property: myers == classic DP on random small-alphabet strings") {
    val g = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'z', ' ')).map(_.mkString))
    forAllSampled2(g, g) { (a: String, b: String) =>
      assert(d(a, b) == ref(a, b), s"'${a.take(40)}' vs '${b.take(40)}'")
    }
  }

  test("block boundaries: every pattern length 60..70 and 125..132") {
    ((60 to 70) ++ (125 to 132)).foreach { m =>
      val a = Array.tabulate(m)(i => ('a' + i % 3).toChar).mkString
      val b = a.drop(7) + "zzz"
      assert(d(a, b) == ref(a, b), s"m=$m")
      // and a long-text side crossing many columns
      val c = (a * 3).take(2 * m)
      assert(d(a, c) == ref(a, c), s"m=$m long")
    }
  }

  test("non-ASCII code points (incl. astral plane) match the classic DP") {
    val pairs = Seq(
      ("héllo wörld", "hello world"),
      ("日本語テキスト", "日本語のテキスト"),
      ("a😀b", "ab"), // emoji = ONE code point, distance 1
      ("😀" * 70, "😀" * 65))
    pairs.foreach { case (a, b) =>
      assert(d(a, b) == ref(a, b), s"'$a' vs '$b'")
    }
    assert(d("a😀b", "ab") == 1)
  }

  test("column form equals Spark's built-in levenshtein on ASCII docs") {
    val spark = SparkHarness.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text".as("a"),
        reverse($"text").as("b"))
    val bad = df.select(
        levenshtein($"a", $"b").as("builtin"),
        EditDistance.levenshteinFastCol($"a", $"b").as("fast"))
      .filter($"builtin" =!= $"fast")
      .count()
    assert(bad == 0L)
  }
}
