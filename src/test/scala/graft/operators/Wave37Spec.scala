package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 37: X324 leave-one-out valuation, X325 dedup impact,
  * X326 epoch allocation.
  */
class Wave37Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("leaveOneOut: removing the dragging group lifts the mean by " +
    "the exact closed form; a group that IS the corpus reports NULL") {
    val s = spark
    import s.implicits._
    // good: mean 10 (3 rows); bad: mean 1 (1 row); full mean 7.75
    val df = Seq(("good", 10.0), ("good", 10.0), ("good", 10.0),
      ("bad", 1.0)).toDF("g", "v")
    val r = DistStats.leaveOneOut(df, "g", "v")
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(r("bad").getAs[Double]("mean_full") == 7.75)
    assert(r("bad").getAs[Double]("mean_without") == 10.0)
    assert(r("bad").getAs[Double]("delta") == -2.25)
    assert(r("bad").getAs[Double]("row_share") == 0.25)
    assert(r("good").getAs[Double]("mean_without") == 1.0)
    val solo = Seq(("only", 5.0)).toDF("g", "v")
    val o = DistStats.leaveOneOut(solo, "g", "v").head()
    assert(o.isNullAt(o.fieldIndex("mean_without")))
  }

  test("dedupImpact: exact copies collapse to the min-id keeper's " +
    "chars; a clean group reports zero ratios") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "dupey", "same text", 9L), (2L, "dupey", "same text", 9L),
      (3L, "dupey", "same text", 9L), (4L, "dupey", "other", 5L),
      (10L, "clean", "aa", 2L), (11L, "clean", "bb", 2L))
      .toDF("doc_id", "source", "text", "n_chars")
    val r = Dedup.dedupImpact(docs, "source", "doc_id", "text",
        "n_chars")
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val d = r("dupey")
    assert(d.getAs[Long]("n_docs") == 4L)
    assert(d.getAs[Long]("n_unique") == 2L)
    assert(d.getAs[Double]("dup_ratio") == 0.5)
    assert(d.getAs[Long]("chars_total") == 32L)
    assert(d.getAs[Long]("chars_kept") == 14L) // 9 (keeper) + 5
    assert(d.getAs[Double]("chars_saved_ratio") == 0.5625)
    assert(r("clean").getAs[Double]("dup_ratio") == 0.0)
    assert(r("clean").getAs[Double]("chars_saved_ratio") == 0.0)
  }

  test("epochAllocation: equal-size sources split the budget evenly; " +
    "a tiny source hits the epoch cap and reports its shortfall") {
    val s = spark
    import s.implicits._
    val docs = Seq(("a", 1000L), ("b", 1000L)).toDF("g", "tok")
    val even = CorpusOps.epochAllocation(docs, "g", "tok",
        budget = 4000L, alpha = 0.5, maxEpochs = 4.0)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    assert(even("a").getAs[Double]("weight") == 0.5)
    assert(even("a").getAs[Long]("target_tokens") == 2000L)
    assert(even("a").getAs[Double]("epochs") == 2.0)
    assert(!even("a").getAs[Boolean]("capped"))
    // alpha 0.5 flattens: a 100x size gap becomes a 10x weight gap,
    // so the small source's target exceeds 4 epochs of its own size
    val skewed = Seq(("big", 10000L), ("small", 100L)).toDF("g", "tok")
    val r = CorpusOps.epochAllocation(skewed, "g", "tok",
        budget = 20000L, alpha = 0.5, maxEpochs = 4.0)
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    val sm = r("small")
    // weight = 10/110; target = 1818 tokens = 18 epochs of 100
    assert(sm.getAs[Boolean]("capped"))
    assert(sm.getAs[Double]("epochs") == 4.0)
    assert(sm.getAs[Long]("realized_tokens") == 400L)
    assert(sm.getAs[Long]("shortfall_tokens") ==
      sm.getAs[Long]("target_tokens") - 400L)
    assert(!r("big").getAs[Boolean]("capped"))
  }
}
