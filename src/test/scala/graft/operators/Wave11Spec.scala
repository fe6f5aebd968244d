package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 11: X223 BH FDR, X224 rank-biased overlap, X225 basket
  * association rules.
  */
class Wave11Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("bhAdjust: textbook step-up — rejects exactly the prefix the " +
    "iα/m thresholds admit, adjusted values are the suffix-min") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0.005), ("b", 0.009), ("c", 0.05),
      ("d", 0.1), ("e", 0.2)).toDF("k", "p")
    val r = Hypothesis.bhAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank").collect()
    // raw p*m/i = [.025, .0225, .0833.., .125, .2]; suffix-min
    // pushes .0225 up to rank 1
    assert(r.map(_.getAs[Double]("p_adj")).toSeq ==
      Seq(0.0225, 0.0225, 0.083333, 0.125, 0.2))
    assert(r.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, false, false, false))
    assert(r.map(_.getAs[Long]("p_rank")).toSeq == (1L to 5L))
    // cap at 1: a single p=0.9 hypothesis adjusts to 0.9, not above
    val one = Hypothesis.bhAdjust(Seq(("z", 0.9)).toDF("k", "p"),
      "k", "p").head()
    assert(one.getAs[Double]("p_adj") == 0.9)
  }

  test("rbo: identical lists score exactly 1, disjoint lists 0, " +
    "hand swap case matches the closed form") {
    val s = spark
    import s.implicits._
    val a = Seq(("q", "a", 1L), ("q", "b", 2L), ("q", "c", 3L))
      .toDF("g", "i", "rk")
    val same = RankEval.rbo(a, a, "g", "i", "rk", k = 3, p = 0.5)
      .head()
    assert(same.getAs[Double]("rbo") == 1.0)
    assert(same.getAs[Long]("overlap_at_k") == 3L)
    val disj = Seq(("q", "x", 1L), ("q", "y", 2L), ("q", "z", 3L))
      .toDF("g", "i", "rk")
    val d = RankEval.rbo(a, disj, "g", "i", "rk", k = 3, p = 0.5)
      .head()
    assert(d.getAs[Double]("rbo") == 0.0)
    assert(d.getAs[Long]("overlap_at_k") == 0L)
    // A=[a,b,c] vs B=[a,c,b]: depths agree 1, 1/3... mass =
    // W(1)+2·W(3) with W(1)=1+p/2+p²/3, W(3)=p²/3; p=0.5 →
    // rbo = 1.5·0.5/0.875 = 6/7
    val b = Seq(("q", "a", 1L), ("q", "c", 2L), ("q", "b", 3L))
      .toDF("g", "i", "rk")
    val h = RankEval.rbo(a, b, "g", "i", "rk", k = 3, p = 0.5)
      .head()
    assert(math.abs(h.getAs[Double]("rbo") - 6.0 / 7.0) < 1e-6)
  }

  test("pairRules: hand baskets — apriori prune removes the rare " +
    "item, set semantics dedupe repeats, metrics match by hand") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "A"), // repeat A dedupes
      (3L, "A"), (3L, "C"),
      (4L, "D")).toDF("b", "i")
    val r = Basket.pairRules(rows, "b", "i", minSupport = 2L)
      .orderBy("item_a", "item_b").collect()
    assert(r.map(x => (x.getAs[String]("item_a"),
      x.getAs[String]("item_b"))).toSeq == Seq(("A", "B"), ("A", "C")))
    val ab = r(0)
    assert(ab.getAs[Long]("pair_count") == 2L)
    assert(ab.getAs[Long]("supp_a") == 3L)
    assert(ab.getAs[Long]("supp_b") == 2L)
    assert(ab.getAs[Double]("support") == 0.5)       // 2/4 baskets
    assert(ab.getAs[Double]("conf_a_b") == 0.666667) // 2/3
    assert(ab.getAs[Double]("conf_b_a") == 1.0)
    assert(ab.getAs[Double]("lift") == 1.333333)     // 2·4/(3·2)
  }

  test("pairRules: maxBasketItems drops oversized baskets from pair " +
    "generation but not from the support universe") {
    val s = spark
    import s.implicits._
    // the cap reads FREQUENT items per basket (that is what bounds
    // the pair join), so C must itself be frequent to oversize b1
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), // 3 frequent items > cap 2
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"),
      (4L, "C")).toDF("b", "i")
    val r = Basket.pairRules(rows, "b", "i", minSupport = 2L,
      maxBasketItems = 2).collect()
    assert(r.length == 1)
    // pair only counted in baskets 2 and 3; support still sees all 3
    assert(r(0).getAs[Long]("pair_count") == 2L)
    assert(r(0).getAs[Long]("supp_a") == 3L)
  }
}
