package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 50 (X374–X378): Mantel-Haenszel pooled OR + Woolf Q, KPSS
  * stationarity, expected calibration error, link-prediction panel,
  * ZCR/energy audio gate. (The four TPC-H shapes X370–X373 are
  * pure relational queries verified by their hash oracles.)
  */
class Wave50Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X374 mantelHaenszel -----------------------------------------------

  test("mantelHaenszel: two hand strata — OR_MH = Σ(ad/n)/Σ(bc/n), " +
    "Woolf df = k−1") {
    // stratum s1: a=10 b=5 c=4 d=8 (n=27); s2: a=6 b=9 c=3 d=12 (n=30)
    val rows =
      Seq.fill(10)(("s1", true, true)) ++ Seq.fill(5)(("s1", true, false)) ++
      Seq.fill(4)(("s1", false, true)) ++ Seq.fill(8)(("s1", false, false)) ++
      Seq.fill(6)(("s2", true, true)) ++ Seq.fill(9)(("s2", true, false)) ++
      Seq.fill(3)(("s2", false, true)) ++ Seq.fill(12)(("s2", false, false))
    val df = rows.toDF("g", "e", "y")
    val r = Hypothesis.mantelHaenszel(df, "g", col("e"), col("y"))
      .collect()(0)
    assert(r.getAs[Long]("n_strata") == 2)
    assert(r.getAs[Long]("woolf_df") == 1)
    // nano-quantized replay of the pooled terms
    val sad = math.round(10.0 * 8 / 27 * 1e9) + math.round(6.0 * 12 / 30 * 1e9)
    val sbc = math.round(5.0 * 4 / 27 * 1e9) + math.round(9.0 * 3 / 30 * 1e9)
    val want = BigDecimal(sad.toDouble / sbc.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("or_mh") == want)
    // similar tables -> tiny heterogeneity
    assert(r.getAs[Double]("woolf_q") >= 0.0)
    assert(r.getAs[Double]("woolf_q") < 1.0)
  }

  // ---- X375 kpssTest -----------------------------------------------------

  test("kpssTest: constant series -> NULL; a random-walk-ish ramp " +
    "reads far above a mean-reverting alternation") {
    val const = (1 to 30).map(i => (i, 7L)).toDF("o", "v")
    val rc = TimeSeries.kpssTest(const, "o", "v").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("kpss_stat")))
    // ramp (trending level — the KPSS alternative)
    val ramp = (1 to 30).map(i => (i, i.toLong * 10)).toDF("o", "v")
    val kRamp = TimeSeries.kpssTest(ramp, "o", "v").collect()(0)
      .getAs[Double]("kpss_stat")
    // alternation around a level (stationary null)
    val alt = (1 to 30).map(i => (i, if (i % 2 == 0) 90L else 110L))
      .toDF("o", "v")
    val kAlt = TimeSeries.kpssTest(alt, "o", "v").collect()(0)
      .getAs[Double]("kpss_stat")
    assert(kRamp > 0.463, s"ramp should reject stationarity: $kRamp")
    assert(kAlt < 0.463, s"alternation should not: $kAlt")
    assert(kRamp > 5 * kAlt)
  }

  // ---- X376 expectedCalibrationError ---------------------------------------

  test("expectedCalibrationError: hand bins — ece = Σ|o·1e6−Σc| / " +
    "(N·1e6), mce = max bin gap") {
    // bin 2: 4 rows conf 0.2, acc 0.25; bin 9: 2 rows conf 0.9, acc 1
    val rows = Seq((200000L, true), (200000L, false), (200000L, false),
      (200000L, false), (900000L, true), (900000L, true))
    val df = rows.toDF("c", "y")
    val r = RankEval.expectedCalibrationError(df, col("c"), col("y"),
      bins = 10).collect()(0)
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("n_bins_used") == 2)
    // |1e6 - 8e5| + |2e6 - 18e5| = 4e5 over 6e6
    assert(r.getAs[Double]("ece") == 0.066667)
    assert(r.getAs[Double]("mce") == 0.1)
  }

  test("expectedCalibrationError: conf 1.0 lands in the TOP bin " +
    "(clamped), and a perfectly calibrated column reads ~0") {
    val df = Seq((1000000L, true), (1000000L, true)).toDF("c", "y")
    val r = RankEval.expectedCalibrationError(df, col("c"), col("y"))
      .collect()(0)
    assert(r.getAs[Long]("n_bins_used") == 1)
    assert(r.getAs[Double]("ece") == 0.0)
  }

  // ---- X377 linkScores -----------------------------------------------------

  test("linkScores: square-with-diagonal hand graph — CN/Jaccard/PA " +
    "and the is_edge backtest flag") {
    // edges: 1-2, 1-3, 2-3, 2-4, 3-4  (degrees: 1:2, 2:3, 3:3, 4:2)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val got = GraphStats.linkScores(e, "s", "d", maxDegree = 10L,
        minCommon = 2L)
      .orderBy("node_a", "node_b").collect()
    assert(got.length == 2)
    val p14 = got(0) // (1,4): common {2,3}
    assert(p14.getAs[Long]("node_a") == 1L &&
      p14.getAs[Long]("node_b") == 4L)
    assert(p14.getAs[Long]("common_neighbors") == 2L)
    assert(p14.getAs[Long]("deg_a") == 2L && p14.getAs[Long]("deg_b") == 2L)
    assert(p14.getAs[Double]("jaccard") == 1.0)
    assert(p14.getAs[Long]("pref_attachment") == 4L)
    assert(!p14.getAs[Boolean]("is_edge"))
    val p23 = got(1) // (2,3): common {1,4}, an existing edge
    assert(p23.getAs[Long]("common_neighbors") == 2L)
    assert(p23.getAs[Double]("jaccard") == 0.5)
    assert(p23.getAs[Long]("pref_attachment") == 9L)
    assert(p23.getAs[Boolean]("is_edge"))
  }

  test("linkScores: the maxDegree valve removes hub MIDDLES but " +
    "keeps full endpoint degrees") {
    // star: hub 9 connects 1..5; plus 1-2 so (1,2) has middle 9 only
    val e = ((1 to 5).map(i => (9L, i.toLong)) :+ (1L, 2L)).toDF("s", "d")
    // cap 4 < deg(9) = 5: the hub can't be a MIDDLE, so the (1,2)
    // pair (whose only shared neighbor is the hub) disappears —
    // wedges through the degree-2 middles 1 and 2 still exist
    assert(GraphStats.linkScores(e, "s", "d", maxDegree = 4L,
        minCommon = 1L)
      .filter(col("node_a") === 1L && col("node_b") === 2L).isEmpty)
    val kept = GraphStats.linkScores(e, "s", "d", maxDegree = 5L,
        minCommon = 1L)
      .filter(col("node_a") === 1L && col("node_b") === 2L)
      .collect()(0)
    // full degrees: deg(1) = deg(2) = 2 (hub edge + the 1-2 edge)
    assert(kept.getAs[Long]("deg_a") == 2L)
    assert(kept.getAs[Long]("pref_attachment") == 4L)
  }

  // ---- X385 brierDecomposition ---------------------------------------------

  test("brierDecomposition: hand bins — BS = REL − RES + UNC when " +
    "confidence is constant within bins") {
    val rows = Seq((200000L, true), (200000L, false), (200000L, false),
      (200000L, false), (900000L, true), (900000L, true))
    val r = RankEval.brierDecomposition(rows.toDF("c", "y"),
      col("c"), col("y"), bins = 10).collect()(0)
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("n_bins_used") == 2)
    assert(r.getAs[Double]("brier") == 0.13)
    assert(r.getAs[Double]("reliability") == 0.005)
    assert(r.getAs[Double]("resolution") == 0.125)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    // Murphy identity holds exactly here (zero within-bin variance)
    assert(math.abs(0.005 - 0.125 + 0.25 - 0.13) < 1e-12)
  }

  // ---- X386 aalenJohansen ----------------------------------------------------

  test("aalenJohansen: hand competing risks — CIFs split the " +
    "all-cause KM mass and sum to the failure probability") {
    // (dur, cause): two events at t=1 (one per cause), censor at 2,
    // cause-1 event at 3
    val subj = Seq((1L, 1), (1L, 2), (2L, 0), (3L, 1)).toDF("dur", "k")
    val got = Funnel.aalenJohansen(subj, "dur", "k")
      .orderBy("t").collect()
    assert(got.length == 2) // censored-only t=2 emits no row
    val t1 = got(0)
    assert(t1.getAs[Long]("t") == 1L && t1.getAs[Long]("n_risk") == 4L)
    assert(t1.getAs[Long]("d1") == 1L && t1.getAs[Long]("d2") == 1L)
    assert(t1.getAs[Double]("cif1") == 0.25)
    assert(t1.getAs[Double]("cif2") == 0.25)
    val t3 = got(1)
    assert(t3.getAs[Long]("t") == 3L && t3.getAs[Long]("n_risk") == 1L)
    // S(3−) = 0.5, so the last cause-1 event adds 0.5
    assert(t3.getAs[Double]("cif1") == 0.75)
    assert(t3.getAs[Double]("cif2") == 0.25)
  }

  // ---- X378 zcrEnergy --------------------------------------------------------

  test("zcrEnergy: sign-flip count with zero as non-negative; exact " +
    "Σv² energy") {
    val p = graft.audio.Pcm.fromSamples(Array(1, -1, 2, -3, 0, -1), 16000)
    val (z, sq) = graft.audio.AudioQa.zcrEnergy(p)
    assert(z == 5L) // every adjacent pair flips (0 counts as +)
    assert(sq == 1L + 1 + 4 + 9 + 0 + 1)
    val silent = graft.audio.Pcm.fromSamples(Array(0, 0, 0), 16000)
    assert(graft.audio.AudioQa.zcrEnergy(silent) == ((0L, 0L)))
  }
}
