package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 5: X199 winnow matches, X200 transition entropy, X201
  * PAA/SAX.
  */
class Wave5Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("winnow matches: near-dup pair surfaces; template text " +
    "shared by many docs is cut by the stop-fingerprint valve") {
    val s = spark
    import s.implicits._
    val shared = "the same long shared passage of text that repeats " +
      "word for word across both documents"
    val docs = Seq(
      (1L, shared + " plus a unique tail alpha"),
      (2L, shared + " plus a different tail beta")) ++
      // 25 identical template docs: every fingerprint df=25 > maxDf
      (10L until 35L).map(i => (i, "template boilerplate body " +
        "identical in every copy of this notice"))
    val out = Winnow.matches(docs.toDF("id", "t"), "id", "t",
      k = 5, w = 4, maxDf = 20, minShared = 3)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(out.contains((1L, 2L)), s"near-dup pair missing: ${out.toSeq}")
    assert(out.forall { case (a, b) => a < 10 && b < 10 },
      s"template pairs leaked past maxDf: ${out.toSeq}")
  }

  test("transitionEntropy: deterministic walks give H=0; a 2/1 split " +
    "gives the hand-computed conditional entropy") {
    val s = spark
    import s.implicits._
    // user 1: a->b->a->b->a (a:{b:2}, b:{a:2}); user 2: a->c
    val ev = Seq((1L, 1, "a"), (1L, 2, "b"), (1L, 3, "a"),
      (1L, 4, "b"), (1L, 5, "a"), (2L, 1, "a"), (2L, 2, "c"))
      .toDF("u", "ord", "st")
    val out = Funnel.transitionEntropy(ev, "u", "st", Seq($"ord"))
      .collect().map(r => r.getAs[String]("cur_state") ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("n_next_states"),
          r.getAs[Double]("h_next"))).toMap
    // a: {b:2, c:1} -> H = ln3 - (2 ln2)/3 = 0.636514
    assert(out("a")._1 == 3L && out("a")._2 == 2L)
    assert(math.abs(out("a")._3 - 0.636514) < 1e-6)
    // b: {a:2} -> H = 0
    assert(out("b") == (2L, 1L, 0.0))
  }

  test("saxSymbols: 8 equal segments of 1..8 map to their own means " +
    "and the abcd ramp; constant series collapses to 'a'") {
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => ("k", i, i.toDouble)).toDF("g", "ord", "v")
    val out = TimeSeries.saxSymbols(df, "g", "v", Seq($"ord"),
      segments = 8, alphabet = 4).orderBy("segment").collect()
    assert(out.map(_.getAs[Double]("seg_mean")).toSeq ==
      (1 to 8).map(_.toDouble))
    // symbol = (4*(v-1)*1e6) div 7000001 -> the abcd ramp
    assert(out.map(_.getAs[String]("symbol")).mkString == "aabbccdd")
    val const = TimeSeries.saxSymbols(
      (1 to 6).map(i => ("k", i, 5.0)).toDF("g", "ord", "v"),
      "g", "v", Seq($"ord"), segments = 3, alphabet = 4)
      .collect().map(_.getAs[String]("symbol")).toSeq
    assert(const == Seq("a", "a", "a"))
  }
}
