package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.functions.NumToWords

/** The codegen Expression must agree with the pure kernel (which is
  * itself golden-tested against the reference) across sign/magnitude
  * edges, through both the SQL registry (GraftExtensions) and the
  * whole-stage-codegen path.
  */
class NumToWordsExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("registered SQL function matches the pure kernel") {
    val s = spark
    import s.implicits._
    val ns = Seq(0L, 7L, 21L, 105L, 1999L, -42L, 1000000L,
      999999999999L, 1000000000000L, Long.MinValue + 1)
    val got = ns.toDF("n")
      .select($"n", call_function("num_to_words", $"n").as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ns.foreach(n => assert(got(n) == NumToWords.concat(n), s"n=$n"))
  }

  test("usable from spark.sql text") {
    val got = spark.sql("SELECT num_to_words(CAST(123 AS BIGINT)) AS w")
      .collect()(0).getString(0)
    assert(got == "onehundredtwentythree")
  }

  test("null-safe") {
    val got = spark.sql(
      "SELECT num_to_words(CAST(NULL AS BIGINT)) AS w").collect()(0)
    assert(got.isNullAt(0))
  }
}
