package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 17: X251 compression signal, X252 growth accounting,
  * X253 markdown profile, X254 weight of evidence.
  */
class Wave17Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("compressionSignals: repetition compresses far below varied " +
    "prose; empty text reports NULL ratio; runs are deterministic") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "ab" * 500),
      (2L, (1 to 200).map(i => s"w$i").mkString(" ")),
      (3L, "")).toDF("id", "text")
    val r = Compression.compressionSignals(df, "id", "text")
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    val rep = r(1L).getAs[Double]("compression_ratio")
    val varied = r(2L).getAs[Double]("compression_ratio")
    assert(rep < 0.05, s"repetition should crush: $rep")
    assert(varied > 3 * rep, s"prose $varied vs repetition $rep")
    assert(r(1L).getAs[Long]("raw_bytes") == 1000L)
    assert(r(3L).isNullAt(r(3L).fieldIndex("compression_ratio")))
    val again = Compression.compressionSignals(df, "id", "text")
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    assert(again(2L).getAs[Long]("deflate_bytes") ==
      r(2L).getAs[Long]("deflate_bytes"))
  }

  test("growthAccounting: hand ledger — classes sum to active and " +
    "churn matches the active(w-1) - retained(w) identity") {
    val s = spark
    import s.implicits._
    // u1: weeks 0,1,3; u2: week 1; u3: week 2
    val df = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L), (3L, 2L))
      .toDF("u", "w")
    val r = Funnel.growthAccounting(df, "u", col("w"))
      .orderBy("period").collect()
    val byW = r.map(x => x.getAs[Long]("period") -> x).toMap
    assert(byW(0L).getAs[Long]("n_new") == 1L)
    assert(byW(1L).getAs[Long]("n_new") == 1L)
    assert(byW(1L).getAs[Long]("n_retained") == 1L)
    assert(byW(2L).getAs[Long]("n_churned_in") == 2L) // u1 + u2
    assert(byW(2L).getAs[Double]("quick_ratio") == 0.5) // (1+0)/2
    assert(byW(3L).getAs[Long]("n_resurrected") == 1L)
    assert(byW(3L).getAs[Long]("n_churned_in") == 1L) // u3
    // identities on every period
    r.foreach { x =>
      assert(x.getAs[Long]("n_active") == x.getAs[Long]("n_new") +
        x.getAs[Long]("n_retained") + x.getAs[Long]("n_resurrected"))
    }
    assert(byW(2L).getAs[Long]("n_churned_in") ==
      byW(1L).getAs[Long]("n_active") - byW(2L).getAs[Long]("n_retained"))
  }

  test("markdownProfile: hand doc counts and the class router") {
    val s = spark
    import s.implicits._
    val md = "# One\n## Two\nprose [x](y) here\n- a\n- b\n* c\n" +
      "```\ncode\n```"
    val df = Seq((1L, md), (2L, "plain prose only."),
      (3L, "- just\n- lists")).toDF("id", "t")
    val r = CorpusOps.markdownProfile(df, "id", "t")
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(1L).getAs[Long]("n_headings") == 2L)
    assert(r(1L).getAs[Long]("n_fences") == 2L)
    assert(r(1L).getAs[Long]("n_links") == 1L)
    assert(r(1L).getAs[Long]("n_list_items") == 3L)
    assert(r(1L).getAs[String]("doc_class") == "code")
    assert(r(2L).getAs[String]("doc_class") == "prose")
    assert(r(3L).getAs[String]("doc_class") == "structured")
  }

  test("weightOfEvidence: symmetric hand bins give woe = ±ln3 and " +
    "IV terms 0.549306 each; one-sided bins report NULL not infinity") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(30)(("A", true)) ++ Seq.fill(10)(("A", false)) ++
      Seq.fill(10)(("B", true)) ++ Seq.fill(30)(("B", false))
    val r = Calibrate.weightOfEvidence(rows.toDF("bin", "y"),
        col("bin"), col("y"))
      .collect().map(x => x.getAs[String]("bin") -> x).toMap
    assert(r("A").getAs[Double]("woe") == 1.098612)
    assert(r("B").getAs[Double]("woe") == -1.098612)
    assert(r("A").getAs[Double]("iv_term") == 0.549306)
    assert(r("B").getAs[Double]("iv_term") == 0.549306)
    val oneSided = (Seq.fill(5)(("C", true)) ++
      Seq.fill(3)(("D", true)) ++ Seq.fill(3)(("D", false)))
      .toDF("bin", "y")
    val o = Calibrate.weightOfEvidence(oneSided, col("bin"), col("y"))
      .collect().map(x => x.getAs[String]("bin") -> x).toMap
    assert(o("C").isNullAt(o("C").fieldIndex("woe")))
    // D: goods 3/8, bads 3/3 -> ln(.375) - ln(1)
    assert(o("D").getAs[Double]("woe") == -0.980829)
  }
}
