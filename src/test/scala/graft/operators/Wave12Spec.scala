package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 12: X226 Mann-Whitney U, X227 McNemar, X228 t-closeness,
  * X229 Chao1, X230 Adamic-Adar.
  */
class Wave12Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("mannWhitneyU: hand case with a 3-way tie — midranks, " +
    "tie-corrected z, and rank-biserial match the textbook numbers") {
    val s = spark
    import s.implicits._
    // A = {1, 1}, B = {1, 2}: value 1 has midrank 2 (three ties),
    // value 2 rank 4. R_A = 4, U_A = 1; sigma^2 = 1; z = -1;
    // rank-biserial = 2*1/4 - 1 = -0.5
    val df = Seq((1.0, true), (1.0, true), (1.0, false), (2.0, false))
      .toDF("v", "ia")
    val r = Hypothesis.mannWhitneyU(df, "v", col("ia")).head()
    assert(r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_stat") == 1.0)
    assert(r.getAs[Double]("z_stat") == -1.0)
    assert(r.getAs[Double]("rank_biserial") == -0.5)
    // no ties, total separation: A = {1,2} below B = {3,4,5} -> U = 0,
    // rank-biserial exactly -1
    val sep = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false),
      (5.0, false)).toDF("v", "ia")
    val r2 = Hypothesis.mannWhitneyU(sep, "v", col("ia")).head()
    assert(r2.getAs[Double]("u_stat") == 0.0)
    assert(r2.getAs[Double]("rank_biserial") == -1.0)
    // all values identical -> sigma = 0 -> z NULL, U = n_a*n_b/2
    val flat = Seq((7.0, true), (7.0, false), (7.0, false))
      .toDF("v", "ia")
    val r3 = Hypothesis.mannWhitneyU(flat, "v", col("ia")).head()
    assert(r3.isNullAt(r3.fieldIndex("z_stat")))
    assert(r3.getAs[Double]("u_stat") == 1.0)
    // fractional values survive (micro-quantization, not long cast)
    val frac = Seq((0.1, true), (0.2, true), (0.3, false), (0.4, false),
      (0.5, false)).toDF("v", "ia")
    assert(Hypothesis.mannWhitneyU(frac, "v", col("ia")).head()
      .getAs[Double]("rank_biserial") == -1.0)
  }

  test("mcnemar: continuity-corrected chi2 from the discordant cells " +
    "only; no-disagreement and |b-c|<=1 boundaries behave") {
    val s = spark
    import s.implicits._
    // n10 = 6 (a only), n01 = 2 (b only): chi2 = (4-1)^2/8 = 1.125
    val rows = Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(5)((true, true)) ++ Seq.fill(3)((false, false))
    val r = Hypothesis.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getAs[Long]("n10") == 6L)
    assert(r.getAs[Long]("n01") == 2L)
    assert(r.getAs[Long]("n11") == 5L)
    assert(r.getAs[Long]("n00") == 3L)
    assert(r.getAs[Double]("chi2") == 1.125)
    assert(r.getAs[Double]("share_a_only") == 0.75)
    // b = c = 1: corrected numerator clamps to 0, not a sign flip
    val even = Seq((true, false), (false, true), (true, true))
      .toDF("a", "b")
    assert(Hypothesis.mcnemar(even, col("a"), col("b")).head()
      .getAs[Double]("chi2") == 0.0)
    // perfect agreement: chi2 NULL
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = Hypothesis.mcnemar(agree, col("a"), col("b")).head()
    assert(ra.isNullAt(ra.fieldIndex("chi2")))
  }

  test("tCloseness: a class pinned to one of two equally-likely " +
    "global levels has EMD 0.5; a class matching the global mix 0") {
    val s = spark
    import s.implicits._
    // global: level 0 x4, level 1 x4 (two classes of 4 rows each);
    // class c1 all level 0 -> cum diff |1 - 0.5| = 0.5, m-1 = 1
    val df = (Seq.fill(4)(("c1", 0L)) ++
      Seq.fill(2)(("c2", 0L)) ++ Seq.fill(2)(("c2", 1L)) ++
      Seq.fill(2)(("c3", 1L))).toDF("qi", "s")
    val r = Privacy.tCloseness(df, Seq("qi"), col("s"), t = 0.3)
      .orderBy("qi").collect()
    // global: 6 at level 0? no: c1=4@0, c2=2@0+2@1, c3=2@1 ->
    // level0 6/10, level1 4/10
    val c1 = r(0)
    assert(c1.getAs[Double]("emd") == 0.4) // |1-0.6| = 0.4
    assert(!c1.getAs[Boolean]("meets_t"))
    val c2 = r(1) // (0.5, 0.5) vs (0.6, 0.4): |0.5-0.6| = 0.1
    assert(c2.getAs[Double]("emd") == 0.1)
    assert(c2.getAs[Boolean]("meets_t"))
    val c3 = r(2) // (0, 1) vs (0.6, 0.4): |0-0.6| = 0.6
    assert(c3.getAs[Double]("emd") == 0.6)
    // single global level: EMD 0 by convention (m = 1)
    val one = Seq(("a", 5L), ("b", 5L)).toDF("qi", "s")
    assert(Privacy.tCloseness(one, Seq("qi"), col("s"), t = 0.1)
      .collect().forall(_.getAs[Double]("emd") == 0.0))
  }

  test("chao1: hand counts — bias-corrected estimate and Good's " +
    "coverage; zero singletons means fully saturated") {
    val s = spark
    import s.implicits._
    // counts {1, 1, 2, 5}: D=4, N=9, f1=2, f2=1 ->
    // chao1 = 4 + 2*1/(2*2) = 4.5; coverage = 1 - 2/9
    val r = DistStats.chao1(Seq(1L, 1L, 2L, 5L).toDF("c"), "c").head()
    assert(r.getAs[Long]("observed") == 4L)
    assert(r.getAs[Long]("n_tokens") == 9L)
    assert(r.getAs[Long]("f1") == 2L)
    assert(r.getAs[Long]("f2") == 1L)
    assert(r.getAs[Double]("chao1") == 4.5)
    assert(r.getAs[Double]("coverage") == 0.777778)
    // no singletons: chao1 = D exactly, coverage 1
    val sat = DistStats.chao1(Seq(3L, 2L, 4L).toDF("c"), "c").head()
    assert(sat.getAs[Double]("chao1") == 3.0)
    assert(sat.getAs[Double]("coverage") == 1.0)
  }

  test("adamicAdar: hand square-with-diagonal — scores sum 1/ln(deg) " +
    "over common neighbors, existing edges flagged, hubs droppable") {
    val s = spark
    import s.implicits._
    // square 1-2, 1-3, 2-4, 3-4 plus diagonal 2-3:
    // deg: 1:2, 2:3, 3:3, 4:2
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 3L))
      .toDF("s1", "s2")
    val r = GraphStats.adamicAdar(e, "s1", "s2", maxDegree = 50L,
      minCommon = 2L).orderBy("node_a", "node_b").collect()
    val byPair = r.map(x => ((x.getAs[Long]("node_a"),
      x.getAs[Long]("node_b")),
      (x.getAs[Long]("common_neighbors"), x.getAs[Double]("aa_score"),
        x.getAs[Boolean]("is_edge")))).toMap
    // (1,4): common {2,3}, both deg 3 -> 2/ln3; not an edge
    val (c14, s14, e14) = byPair((1L, 4L))
    assert(c14 == 2L && !e14)
    assert(math.abs(s14 - 2.0 / math.log(3.0)) < 1e-6)
    // (2,3): common {1,4}, both deg 2 -> 2/ln2; IS an edge
    val (c23, s23, e23) = byPair((2L, 3L))
    assert(c23 == 2L && e23)
    assert(math.abs(s23 - 2.0 / math.log(2.0)) < 1e-6)
    assert(byPair.size == 2) // all other pairs share < 2 neighbors
    // maxDegree valve: capping at 2 removes the deg-3 middles, so
    // (1,4) loses both witnesses and disappears; (2,3) survives via
    // the deg-2 middles 1 and 4
    val capped = GraphStats.adamicAdar(e, "s1", "s2", maxDegree = 2L,
      minCommon = 2L).collect()
    assert(capped.length == 1)
    assert(capped(0).getAs[Long]("node_a") == 2L)
    assert(capped(0).getAs[Long]("node_b") == 3L)
  }
}
