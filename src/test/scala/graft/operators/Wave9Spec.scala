package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 9: X215 winnow span anchors, X216 streaming Benford,
  * X217 dispersion index.
  */
class Wave9Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("spanAnchors: a copied run votes one dominant diagonal equal " +
    "to its offset shift, and the span bounds sit inside the run") {
    val s = spark
    import s.implicits._
    val run = "the quick brown fox jumps over the lazy dog again"
    // doc 2 embeds the same run 10 normalized chars later than doc 1
    val docs = Seq(
      (1L, "abcd " + run),
      (2L, "abcdefghijklmn " + run)).toDF("id", "t")
    val out = Winnow.spanAnchors(docs, "id", "t", k = 5, w = 4,
      maxDf = 20, minShared = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 2L)
    // normalized prefixes: "abcd" (4 chars) vs "abcdefghijklmn" (14)
    assert(r.getAs[Long]("diag") == 10L)
    assert(r.getAs[Long]("diag_votes") >= 3L)
    assert(r.getAs[Long]("span1_lo") >= 4L)
    assert(r.getAs[Long]("span1_hi") <=
      4L + run.toLowerCase.replaceAll("[^a-z0-9]", "").length)
  }

  test("dispersionIndex: constant buckets 0, the [1,3] hand case 1, " +
    "single bucket NULLs variance") {
    val s = spark
    import s.implicits._
    // key a: 3 buckets x 2 rows; key b: buckets with 1 and 3 rows;
    // key c: one bucket only
    val rows = Seq(("a", 1), ("a", 1), ("a", 2), ("a", 2), ("a", 3),
      ("a", 3), ("b", 1), ("b", 2), ("b", 2), ("b", 2),
      ("c", 9)).toDF("k", "b")
    val out = DistStats.dispersionIndex(rows, "k", "b").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Double]("mean_count"),
          Option(r.getAs[java.lang.Double]("dispersion"))
            .map(_.doubleValue))).toMap
    assert(out("a") == (3L, 2.0, Some(0.0)))
    assert(out("b") == (2L, 2.0, Some(1.0)))
    assert(out("c")._3.isEmpty)
  }

  test("budgetSelect: greedy by quality-per-token, boundary doc " +
    "excluded, budget-too-small gives empty") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 5L), (2L, 6L, 6L), (3L, 1L, 100L),
      (4L, 5L, 0L)).toDF("id", "q", "tok")
    val out = CorpusOps.budgetSelect(df, "id", "q", "tok",
      budget = 12L).orderBy("sel_rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(5L, 11L))
    assert(out.map(_.getAs[Long]("sel_rank")).toSeq == Seq(1L, 2L))
    val none = CorpusOps.budgetSelect(df, "id", "q", "tok",
      budget = 3L)
    assert(none.count() == 0L)
  }

  test("streaming Benford tracker equals the batch operator over " +
    "concatenated batches, for any cut") {
    val s = spark
    import s.implicits._
    val all = (1 to 200).map(i => (i * i * 1.37) % 977 + 0.01)
    val cuts = Seq(all.take(70), all.slice(70, 140), all.drop(140))
    val tr = graft.streaming.StreamingBenford.tracker()
    cuts.foreach(b => tr.update(b.toDF("v"), "v"))
    val got = tr.report()
      .map { case (d, o, e, c) => d -> ((o, e, c)) }.toMap
    val want = DistStats.benford(all.toDF("v"), "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("observed"), r.getAs[Double]("expected"),
          r.getAs[Double]("chi2_term")))).toMap
    assert(got == want, s"got=$got want=$want")
  }
}
