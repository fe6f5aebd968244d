package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 5: X149 two-sample tests, X150 JS divergence, X151 char
  * entropy, X152 Krippendorff's alpha.
  */
class HypothesisSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // ---- X149a welchTTest ----------------------------------------------

  test("welchTTest matches the hand-computed unequal-variance case " +
    "and NULLs degenerate groups") {
    val s = spark
    import s.implicits._
    // a = [1,2,3,4] (mean 2.5, var 5/3), b = [2,4,6,8] (mean 5, var 20/3)
    // se2 = 5/12 + 5/3 = 25/12; t = -2.5/sqrt(25/12) = -1.732051
    // dof = (25/12)^2 / ((5/12)^2/3 + (5/3)^2/3) = 1875/425 = 4.411765
    val df = (Seq(1L, 2L, 3L, 4L).map((_, true)) ++
      Seq(2L, 4L, 6L, 8L).map((_, false))).toDF("v", "g")
    val r = Hypothesis.welchTTest(df, "v", $"g").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 2.5)
    assert(r.getAs[Double]("mean_b") == 5.0)
    assert(math.abs(r.getAs[Double]("t_stat") - -1.732051) < 1e-6)
    assert(math.abs(r.getAs[Double]("dof") - 4.411765) < 1e-6)
    // single-element group -> NULL t
    val r1 = Hypothesis.welchTTest(
      Seq((1L, true), (2L, false), (3L, false)).toDF("v", "g"),
      "v", $"g").head()
    assert(r1.isNullAt(r1.fieldIndex("t_stat")))
    // zero-variance both sides (se2 = 0) -> NULL, no divide-by-zero
    val r0 = Hypothesis.welchTTest(
      Seq((5L, true), (5L, true), (7L, false), (7L, false)).toDF("v", "g"),
      "v", $"g").head()
    assert(r0.isNullAt(r0.fieldIndex("t_stat")))
  }

  test("welchTTest sees fractional scores exactly (micro-unit " +
    "quantization; t/dof are scale-invariant)") {
    val s = spark
    import s.implicits._
    // the integer hand case scaled by 1/10: a = [.1,.2,.3,.4],
    // b = [.2,.4,.6,.8] -> same t and dof, means scale down with it
    val df = (Seq(0.1, 0.2, 0.3, 0.4).map((_, true)) ++
      Seq(0.2, 0.4, 0.6, 0.8).map((_, false))).toDF("v", "g")
    val r = Hypothesis.welchTTest(df, "v", $"g").head()
    assert(r.getAs[Double]("mean_a") == 0.25)
    assert(r.getAs[Double]("mean_b") == 0.5)
    assert(math.abs(r.getAs[Double]("t_stat") - -1.732051) < 1e-6)
    assert(math.abs(r.getAs[Double]("dof") - 4.411765) < 1e-6)
  }

  // ---- X149b twoProportionZ ------------------------------------------

  test("twoProportionZ matches the pooled-SE hand case and NULLs " +
    "degenerate pools") {
    val s = spark
    import s.implicits._
    // a: 8/10, b: 4/10 -> pp = 0.6, se = sqrt(0.048), z = 1.825742
    val rows = Seq.fill(8)((true, true)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(4)((true, false)) ++ Seq.fill(6)((false, false))
    val r = Hypothesis.twoProportionZ(rows.toDF("ok", "g"),
      $"ok", $"g").head()
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("n_b") == 10L)
    assert(r.getAs[Double]("rate_a") == 0.8)
    assert(r.getAs[Double]("rate_b") == 0.4)
    assert(math.abs(r.getAs[Double]("z_stat") - 1.825742) < 1e-6)
    // all successes on both sides -> pooled rate 1 -> NULL z
    val r1 = Hypothesis.twoProportionZ(
      Seq((true, true), (true, false)).toDF("ok", "g"),
      $"ok", $"g").head()
    assert(r1.isNullAt(r1.fieldIndex("z_stat")))
  }

  // ---- X152 krippendorffAlpha ----------------------------------------

  test("krippendorffAlpha: perfect agreement 1, inverted binary -0.5, " +
    "hand-computed coincidence case") {
    val s = spark
    import s.implicits._
    def alpha(rows: Seq[(String, String)]): Option[Double] = {
      val r = Hypothesis.krippendorffAlpha(rows.toDF("a", "b"), "a", "b")
        .head()
      if (r.isNullAt(r.fieldIndex("alpha"))) None
      else Some(r.getAs[Double]("alpha"))
    }
    assert(alpha(Seq(("x", "x"), ("y", "y"), ("x", "x"))).contains(1.0))
    // (0,1),(1,0): N=2, n=4, D=2, marginals 2/2 -> sq=8, de=8,
    // alpha = 1 - 3*4/8 = -0.5 (systematic inversion)
    assert(alpha(Seq(("0", "1"), ("1", "0"))).contains(-0.5))
    // (a,a),(a,a),(b,b),(b,a): D=1, n=8, n_a=5, n_b=3,
    // de = 64-34 = 30, alpha = 1 - 7*2/30 = 0.533333
    assert(alpha(Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "a")))
      .map(v => math.abs(v - 0.533333) < 1e-6).getOrElse(false))
    // single shared value -> De = 0 -> NULL
    assert(alpha(Seq(("x", "x"), ("x", "x"))).isEmpty)
  }

  // ---- X150 jsDivergence ---------------------------------------------

  test("jsDivergence: identical distributions 0, disjoint 1 bit, " +
    "counts reported") {
    val s = spark
    import s.implicits._
    val same = Seq(("x", true), ("y", true), ("x", false), ("y", false))
      .toDF("cat", "b")
    val r0 = CorpusOps.jsDivergence(same, "cat", $"b").head()
    assert(r0.getAs[Double]("jsd_nats") == 0.0)
    assert(r0.getAs[Double]("jsd_bits") == 0.0)
    assert(r0.getAs[Long]("n_baseline") == 2L)
    assert(r0.getAs[Long]("n_categories") == 2L)
    val disjoint = Seq(("x", true), ("y", false)).toDF("cat", "b")
    val r1 = CorpusOps.jsDivergence(disjoint, "cat", $"b").head()
    assert(math.abs(r1.getAs[Double]("jsd_bits") - 1.0) < 1e-6)
    assert(math.abs(r1.getAs[Double]("jsd_nats") - math.log(2.0)) < 1e-6)
  }

  // ---- X151 charEntropy ----------------------------------------------

  test("charEntropy: uniform alphabets hit log2(k), constant text 0, " +
    "empty text 0 with 0 distinct") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"), (4L, ""))
      .toDF("doc_id", "text")
    val out = CorpusOps.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("char_entropy_bits") == 1.0)
    assert(out(1L).getAs[Long]("n_distinct_chars") == 2L)
    assert(out(2L).getAs[Double]("char_entropy_bits") == 2.0)
    assert(out(3L).getAs[Double]("char_entropy_bits") == 0.0)
    assert(out(3L).getAs[Long]("n_distinct_chars") == 1L)
    assert(out(4L).getAs[Long]("text_len") == 0L)
    assert(out(4L).getAs[Long]("n_distinct_chars") == 0L)
    assert(out(4L).getAs[Double]("char_entropy_bits") == 0.0)
  }
}
