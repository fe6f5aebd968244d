package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 9: X160 log2-linear quantile store, X161 CMS join-size
  * estimate.
  */
class LogHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("small values get exact singleton buckets; quantiles there " +
    "are exact") {
    val s = spark
    import s.implicits._
    val vals = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 13L, 15L)
    val store = LogHistogram.build(
      vals.map(("k", _)).toDF("key", "v"), "key", "v")
    // every value < 16 -> its own bucket
    assert(store.count() == vals.length)
    val q = LogHistogram.quantiles(store, Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getAs[Double]("q") ->
        r.getAs[Double]("estimate")).toMap
    assert(q(0.0) == 0.0)
    assert(q(0.5) == 5.0)  // median of the 9 values
    assert(q(1.0) == 15.0)
  }

  test("quantile estimates stay within the 2^-subBits relative-error " +
    "guarantee on a wide deterministic value set") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-values spanning 5 orders of magnitude
    val vals = (1 to 2000).map(i => ((i.toLong * 2654435761L) % 99991L)
      * ((i % 7) + 1))
    val sorted = vals.sorted
    val store = LogHistogram.build(
      vals.map(("k", _)).toDF("key", "v"), "key", "v")
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = LogHistogram.quantiles(store, qs)
      .collect().map(r => r.getAs[Double]("q") ->
        r.getAs[Double]("estimate")).toMap
    qs.foreach { q =>
      val exact = sorted(math.floor(q * (vals.length - 1)).toInt).toDouble
      val rel = math.abs(est(q) - exact) / math.max(exact, 1.0)
      assert(rel <= 1.0 / 16,
        s"q=$q est=${est(q)} exact=$exact rel=$rel")
    }
  }

  test("merge law: count-sum merge of shard stores equals the store " +
    "of the union") {
    val s = spark
    import s.implicits._
    val aVals = (1 to 300).map(i => ("sh0", (i * 37L) % 5000L))
    val bVals = (1 to 400).map(i => ("sh1", (i * 91L) % 20000L))
    val merged = LogHistogram.merge(
      LogHistogram.build(aVals.toDF("key", "v"), "key", "v")
        .unionByName(LogHistogram.build(bVals.toDF("key", "v"),
          "key", "v")), lit("all"))
    val whole = LogHistogram.build(
      (aVals ++ bVals).map(t => ("all", t._2)).toDF("key", "v"),
      "key", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(canon(merged) == canon(whole))
  }

  test("bucket index is monotone non-decreasing in the value") {
    val s = spark
    import s.implicits._
    val buckets = LogHistogram.build(
        (0L to 5000L).map(("k", _)).toDF("key", "v"), "key", "v")
      .orderBy("bucket").collect().map(_.getLong(1))
    assert(buckets.toSeq == buckets.sorted.toSeq)
    // and lo-bounds partition the range: counts sum to the row count
    assert(LogHistogram.build(
      (0L to 5000L).map(("k", _)).toDF("key", "v"), "key", "v")
      .agg(sum("cnt")).head().getLong(0) == 5001L)
  }

  test("CMS inner product upper-bounds the exact self-join size and " +
    "is tight on a small key set") {
    val s = spark
    import s.implicits._
    val rows = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val sk = Cms.sketch(rows, "k")
    val est = Cms.innerProduct(sk, sk).head().getLong(0)
    val exact = 10L * 10 + 5L * 5 + 2L * 2 // 129
    assert(est >= exact)
    assert(est <= 2 * exact, s"est $est implausibly loose vs $exact")
    // disjoint key sets -> inner product collapses toward 0
    val other = Cms.sketch(Seq.fill(7)("zzz").toDF("k"), "k")
    val cross = Cms.innerProduct(sk, other).head().getLong(0)
    assert(cross <= 20L, s"disjoint estimate $cross not near zero")
  }

  test("innerProduct derives depth from the sketches (depth-8 works " +
    "without a parameter) and errors loudly on a depth mismatch") {
    val s = spark
    import s.implicits._
    val rows = (Seq.fill(10)("a") ++ Seq.fill(5)("b")).toDF("k")
    val sk8 = Cms.sketch(rows, "k", depth = 8)
    val est = Cms.innerProduct(sk8, sk8).head().getLong(0)
    assert(est >= 10L * 10 + 5L * 5) // used to silently return 0
    val sk4 = Cms.sketch(rows, "k", depth = 4)
    // raise_error fires lazily at execution time, wrapped by Spark
    val e = intercept[Exception] {
      Cms.innerProduct(sk8, sk4).collect()
    }
    assert(e.getMessage.contains("depth mismatch"))
  }

  test("quantiles reads sub_bits from the store and rejects a " +
    "mixed-geometry merge") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(v => ("k", v)).toDF("key", "v")
    // depth-8 store decoded without any caller-supplied parameter:
    // tighter 2^-8 error bound must hold
    val st8 = LogHistogram.build(df, "key", "v", subBits = 8)
    LogHistogram.quantiles(st8, Seq(0.5)).collect().foreach { r =>
      val est = r.getAs[Double]("estimate")
      assert(math.abs(est - 50.0) <= 50.0 / 256 + 1.0, s"est $est")
    }
    val st4 = LogHistogram.build(df, "key", "v", subBits = 4)
    val mixed = LogHistogram.merge(
      st8.unionByName(st4), org.apache.spark.sql.functions.lit("all"))
    val e = intercept[IllegalArgumentException] {
      LogHistogram.quantiles(mixed, Seq(0.5))
    }
    assert(e.getMessage.contains("sub_bits"))
  }
}
