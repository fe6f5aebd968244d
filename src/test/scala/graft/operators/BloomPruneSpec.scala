package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** BloomPrune: exact equality with the plain semi join for long and
  * string keys (including at a deliberately terrible fpp, where the
  * prune passes almost everything and the join must still clean up),
  * and rejection of unsupported key types.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("long keys: pruned == plain semi join, across fpp settings") {
    val s = spark
    import s.implicits._
    val probe = (0L until 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 5000L by 13L).toDF("bk")
    val want = probe.join(build, $"k" === $"bk", "left_semi")
      .as[(Long, String)].collect().toSet
    assert(want.nonEmpty)
    for (fpp <- Seq(0.01, 0.5)) {
      val got = BloomPrune.semiJoin(probe, build, "k", "bk",
          expectedItems = 1000L, fpp = fpp)
        .as[(Long, String)].collect().toSet
      assert(got == want, s"fpp=$fpp")
    }
  }

  test("string keys and null probe keys") {
    val s = spark
    import s.implicits._
    val probe = (Seq[Option[String]](None) ++
      (0 until 300).map(i => Some(s"id$i"))).toDF("k")
    val build = (0 until 300 by 7).map(i => s"id$i").toDF("bk")
    val want = probe.join(build, $"k" === $"bk", "left_semi")
      .as[Option[String]].collect().toSet
    val got = BloomPrune.semiJoin(probe, build, "k", "bk", 100L)
      .as[Option[String]].collect().toSet
    assert(got == want && !got.contains(None))
  }

  test("same key name on both sides resolves without ambiguity") {
    val s = spark
    import s.implicits._
    val probe = (0L until 100L).toDF("k")
    val build = (0L until 100L by 9L).toDF("k")
    val got = BloomPrune.semiJoin(probe, build, "k", "k", 50L)
      .as[Long].collect().toSet
    assert(got == (0L until 100L by 9L).toSet)
  }

  test("unsupported key type is rejected loudly") {
    val s = spark
    import s.implicits._
    val probe = Seq(1.5, 2.5).toDF("k")
    val build = Seq(1.5).toDF("bk")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(probe, build, "k", "bk", 10L)
    }
    assert(e.getMessage.contains("integral or string"))
  }
}
