package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 53 (X387–X402): Hochberg/Šidák, Fisher exact, Siegel-Tukey,
  * two-sample Anderson-Darling, Moses span, modularity, Holt linear
  * trend. (The TPC-H shapes X397–X401 and the inline causal/eval
  * queries are verified by their hash oracles.)
  */
class Wave53Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X387 hochbergAdjust -------------------------------------------------

  test("hochbergAdjust: hand p-values — suffix-min of (m−rk+1)p, " +
    "dominates Holm, Šidák column") {
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03)).toDF("k", "p")
    val r = Hypothesis.hochbergAdjust(df, "k", "p")
      .collect().map(x => x.getAs[String]("k") ->
        (x.getAs[Double]("p_adj"), x.getAs[Double]("p_sidak"))).toMap
    assert(r("a")._1 == 0.03) // min(.03, .04, .06)
    assert(r("c")._1 == 0.04) // min(.06, .04)
    assert(r("b")._1 == 0.04)
    assert(r("a")._2 == 0.029701) // 1 - 0.99^3
    // Holm on the same family is never smaller
    val h = Hypothesis.holmAdjust(df, "k", "p")
      .collect().map(x => x.getAs[String]("k") ->
        x.getAs[Double]("p_adj")).toMap
    assert(r.forall { case (k, (adj, _)) => adj <= h(k) })
  }

  // ---- X388 fisherExact ------------------------------------------------------

  test("fisherExact: the tea-tasting 3/1/1/3 table — p = 34/70, " +
    "nano-quantized") {
    val rows = Seq.fill(3)(("g", true, true)) ++
      Seq.fill(1)(("g", true, false)) ++
      Seq.fill(1)(("g", false, true)) ++
      Seq.fill(3)(("g", false, false))
    val r = Hypothesis.fisherExact(rows.toDF("g", "e", "y"),
      "g", col("e"), col("y")).collect()(0)
    assert(r.getAs[Long]("a") == 3 && r.getAs[Long]("d") == 3)
    assert(r.getAs[Double]("p_two_sided") == 0.485714286)
  }

  test("fisherExact: independent margins give p = 1; a diagonal " +
    "table is extreme") {
    // 2/2/2/2: every k equally weighted by symmetry -> p = 1
    val flat = (Seq.fill(2)(("g", true, true)) ++
      Seq.fill(2)(("g", true, false)) ++
      Seq.fill(2)(("g", false, true)) ++
      Seq.fill(2)(("g", false, false))).toDF("g", "e", "y")
    val pf = Hypothesis.fisherExact(flat, "g", col("e"), col("y"))
      .collect()(0).getAs[Double]("p_two_sided")
    assert(pf == 1.0)
    // 5/0/0/5: only the two diagonal tables weigh <= wobs
    val diag = (Seq.fill(5)(("g", true, true)) ++
      Seq.fill(5)(("g", false, false))).toDF("g", "e", "y")
    val pd = Hypothesis.fisherExact(diag, "g", col("e"), col("y"))
      .collect()(0).getAs[Double]("p_two_sided")
    // 2/C(10,5) = 2/252
    assert(pd == 0.007936508)
  }

  // ---- X389 siegelTukey ------------------------------------------------------

  test("siegelTukey: hand alternating-extreme ranks — wide A around " +
    "narrow B scores the extremes") {
    // combined order: 1(A) 50(B) 51(B) 100(A) -> ST ranks 1,4,3,2
    val df = Seq((1.0, 1L, true), (100.0, 2L, true),
      (50.0, 3L, false), (51.0, 4L, false)).toDF("v", "id", "a")
    val r = Hypothesis.siegelTukey(df, "v", col("a"), col("id"))
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("w_a") == 3) // ranks 1 + 2
    assert(r.getAs[Double]("u_stat") == 0.0)
    assert(r.getAs[Double]("z_stat") == -1.549193)
  }

  test("siegelTukey: identical dispersion is rank-balanced") {
    // interleaved equal-spread groups: U near the null mean
    val df = (1 to 40).map(i => (i.toDouble, i.toLong, i % 2 == 0))
      .toDF("v", "id", "a")
    val r = Hypothesis.siegelTukey(df, "v", col("a"), col("id"))
      .collect()(0)
    val u = r.getAs[Double]("u_stat")
    assert(math.abs(u - 200.0) <= 20.0, s"u=$u should sit near nm/2")
  }

  // ---- X390 ad2Sample --------------------------------------------------------

  test("ad2Sample: identical multisets give exactly 0; a shift is " +
    "detected") {
    val same = ((1 to 50).map(i => (i.toDouble, true)) ++
      (1 to 50).map(i => (i.toDouble, false))).toDF("v", "a")
    val r0 = Hypothesis.ad2Sample(same, "v", col("a")).collect()(0)
    assert(r0.getAs[Long]("n_a") == 50)
    assert(r0.getAs[Double]("ad_stat") == 0.0)
    val shifted = ((1 to 50).map(i => (i.toDouble, true)) ++
      (1 to 50).map(i => (i.toDouble + 30.0, false))).toDF("v", "a")
    val r1 = Hypothesis.ad2Sample(shifted, "v", col("a")).collect()(0)
    assert(r1.getAs[Double]("ad_stat") > 2.0,
      s"shift should reject: ${r1.getAs[Double]("ad_stat")}")
  }

  test("ad2Sample: fat-tailed alternative trips AD harder than the " +
    "matched-median middle suggests") {
    // same median, B pushes both tails out
    val a = (1 to 100).map(i => (50.0 + (i % 10), true))
    val b = (1 to 100).map(i =>
      (if (i % 2 == 0) 5.0 + (i % 10) else 100.0 + (i % 10), false))
    val r = Hypothesis.ad2Sample((a ++ b).toDF("v", "a"), "v",
      col("a")).collect()(0)
    assert(r.getAs[Double]("ad_stat") > 10.0)
  }

  // ---- X391 mosesSpan --------------------------------------------------------

  test("mosesSpan: hand positions — trim 1 from each side") {
    // combined order: 10A 20A 25B 30A 35B 40A 50A; A pos 0,1,3,5,6
    val df = Seq((10.0, 1L, true), (20.0, 2L, true), (30.0, 3L, true),
      (40.0, 4L, true), (50.0, 5L, true),
      (25.0, 6L, false), (35.0, 7L, false)).toDF("v", "id", "a")
    val r = Hypothesis.mosesSpan(df, "v", col("a"), col("id"),
      trim = 1).collect()(0)
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("span") == 5) // positions 1..5
    assert(r.getAs[Long]("excess") == 2)
  }

  test("mosesSpan: trim eating the whole group yields NULL span") {
    val df = Seq((1.0, 1L, true), (2.0, 2L, true),
      (3.0, 3L, false)).toDF("v", "id", "a")
    val r = Hypothesis.mosesSpan(df, "v", col("a"), col("id"),
      trim = 1).collect()(0)
    assert(r.isNullAt(r.fieldIndex("span")))
  }

  // ---- X392 modularity -------------------------------------------------------

  test("modularity: two disjoint triangles under their own labels " +
    "give Q = 1/2") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("s", "d")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "label")
    val r = GraphStats.modularity(e, "s", "d", lab, "node", "label")
      .collect()(0)
    assert(r.getAs[Long]("n_communities") == 2)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("q_num") == 72) // 2 * (4*6*3 - 36)
    assert(r.getAs[Double]("modularity") == 0.5)
  }

  test("modularity: one community holding everything scores 0; " +
    "unlabeled nodes fall to singletons") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val all = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
      .toDF("node", "label")
    val r0 = GraphStats.modularity(e, "s", "d", all, "node", "label")
      .collect()(0)
    // e_c = m and d_c = 2m -> 4m·m − 4m² = 0
    assert(r0.getAs[Long]("q_num") == 0)
    assert(r0.getAs[Double]("modularity") == 0.0)
    val none = Seq((1L, None: Option[Long]), (2L, None),
      (3L, None), (4L, None)).toDF("node", "label")
    val r1 = GraphStats.modularity(e, "s", "d", none, "node", "label")
      .collect()(0)
    assert(r1.getAs[Long]("n_communities") == 4)
    assert(r1.getAs[Double]("modularity") < 0.0)
  }

  // ---- X393 holtLinear -------------------------------------------------------

  test("holtLinear: hand recursion — floor-halved integer state") {
    val df = Seq(("a", 10.0), ("b", 12.0), ("c", 15.0))
      .toDF("o", "v")
    val rows = TimeSeries.holtLinear(df, "o", "v")
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    assert(rows("a").getAs[Double]("level") == 10.0)
    assert(rows("a").getAs[Double]("trend") == 2.0)
    assert(rows("a").isNullAt(rows("a").fieldIndex("forecast")))
    assert(rows("b").getAs[Double]("forecast") == 12.0)
    assert(rows("b").getAs[Double]("level") == 12.0)
    assert(rows("b").getAs[Double]("trend") == 2.0)
    assert(rows("c").getAs[Double]("forecast") == 14.0)
    assert(rows("c").getAs[Double]("level") == 14.5)
    assert(rows("c").getAs[Double]("trend") == 2.25)
  }

  test("holtLinear: a single point seeds level only; constant series " +
    "locks trend at 0") {
    val one = TimeSeries.holtLinear(Seq(("x", 5.0)).toDF("o", "v"),
      "o", "v").collect()(0)
    assert(one.getAs[Double]("level") == 5.0)
    assert(one.isNullAt(one.fieldIndex("trend")))
    val const = TimeSeries.holtLinear(
      (1 to 10).map(i => (f"t$i%02d", 7.0)).toDF("o", "v"), "o", "v")
      .collect()
    assert(const.forall(r => r.getAs[Double]("trend") == 0.0))
    assert(const.filter(!_.isNullAt(4))
      .forall(r => r.getAs[Double]("forecast") == 7.0))
  }
}