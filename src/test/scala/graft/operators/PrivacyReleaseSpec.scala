package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 16: X173 pseudonymization, X174 noisy counts. */
class PrivacyReleaseSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("pseudonymize is referentially stable across tables, " +
    "salt-sensitive, and rejects empty salts") {
    val s = spark
    import s.implicits._
    val a = Seq((7L, "x"), (8L, "y"), (7L, "z")).toDF("uid", "v")
    val b = Seq((7L, 1.0), (9L, 2.0)).toDF("uid", "w")
    val pa = Privacy.pseudonymize(a, Seq("uid"), "s1")
    val pb = Privacy.pseudonymize(b, Seq("uid"), "s1")
    // same id -> same token across tables: the join still works
    assert(pa.join(pb, Seq("uid")).count() == 2) // two rows with uid 7
    // tokens are not the raw ids
    assert(pa.filter($"uid" === "7").count() == 0)
    // different salt -> disjoint token space
    val pa2 = Privacy.pseudonymize(a, Seq("uid"), "s2")
    assert(pa.select("uid").intersect(pa2.select("uid")).count() == 0)
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(a, Seq("uid"), "")
    }
  }

  test("noisyCounts: reproducible, salt-dependent, noise magnitude " +
    "consistent with the 1/epsilon Laplace scale") {
    val s = spark
    import s.implicits._
    val rows = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(10)("c")).toDF("cat")
    def release(salt: String, eps: Double) =
      Privacy.noisyCounts(rows, "cat", eps, salt)
        .collect().map(r => r.getString(0) ->
          r.getAs[Double]("noisy_count")).toMap
    val r1 = release("k", 0.5)
    assert(r1 == release("k", 0.5)) // reproducible
    assert(r1 != release("other", 0.5)) // salt changes the draw
    // noise centered near the true counts: for eps=0.5 the Laplace
    // scale is 2, so P(|noise| > 20) ~ e^-10 — bound generously
    Map("a" -> 100.0, "b" -> 50.0, "c" -> 10.0).foreach {
      case (cat, n) =>
        assert(math.abs(r1(cat) - n) < 25.0,
          s"$cat: ${r1(cat)} vs $n")
    }
    // tighter epsilon -> smaller noise for the same category draw
    val tight = release("k", 50.0)
    Map("a" -> 100.0, "b" -> 50.0, "c" -> 10.0).foreach {
      case (cat, n) =>
        assert(math.abs(tight(cat) - n) <= math.abs(r1(cat) - n) + 1e-9)
    }
    intercept[IllegalArgumentException] {
      Privacy.noisyCounts(rows, "cat", 0.0, "k")
    }
  }
}
