package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 6: X202 exact set-similarity join, X203 lead-lag corr,
  * X204 calibration metrics, X205 Merkle roots, X206 k-core.
  */
class Wave6Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("jaccardJoin: hand overlap pair, exact completeness vs brute " +
    "force, threshold respected") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e"),     // shingles abc bcd cde
      (2L, "a b c d f"),     // shingles abc bcd cdf -> J(1,2)=1/2
      (3L, "x y z w q"),     // disjoint
      (4L, "a b c d e"),     // identical to 1 -> J=1
      (5L, "p q r s t u v")) // disjoint
      .toDF("id", "t")
    val got = SetJoin.jaccardJoin(docs, "id", "t", shingleK = 3,
      tNum = 1L, tDen = 2L).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("union_size"),
          r.getAs[Double]("jaccard"))).toMap
    assert(got((1L, 2L)) == (2L, 4L, 0.5))
    assert(got((1L, 4L)) == (3L, 3L, 1.0))
    assert(got((2L, 4L)) == (2L, 4L, 0.5))
    // brute-force completeness on the same corpus
    def sh(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString("\u0001")).toSet
    val texts = Map(1L -> "a b c d e", 2L -> "a b c d f",
      3L -> "x y z w q", 4L -> "a b c d e", 5L -> "p q r s t u v")
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      ia = sh(texts(a)); ib = sh(texts(b))
      inter = (ia & ib).size; un = (ia | ib).size
      if inter * 3 >= (ia.size + ib.size)
    } yield (a, b)).toSet
    assert(got.keySet == want)
  }

  test("leadLagCorr: a 2-day-shifted copy correlates perfectly at " +
    "exactly lag 2") {
    val s = spark
    import s.implicits._
    val x = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L, 6L, 10L)
    val base = java.sql.Date.valueOf("2024-03-01").toLocalDate
    // y(day) = x(day - 2): correlating x(day) with y(day+2) is exact
    val rows = x.indices.map { i =>
      (java.sql.Date.valueOf(base.plusDays(i)), x(i),
        if (i >= 2) x(i - 2) else 0L)
    }
    val out = TimeSeries.leadLagCorr(rows.toDF("day", "x", "y")
        .filter($"day" >= java.sql.Date.valueOf(base.plusDays(2))),
      "day", "x", "y", maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") ->
        Option(r.getAs[java.lang.Double]("corr")).map(_.doubleValue))
      .toMap
    assert(out(2).contains(1.0), s"lag-2 corr not 1: $out")
    assert(out(0).forall(_ < 1.0))
  }

  test("calibrationMetrics: perfect predictions score 0/0; a " +
    "uniformly overconfident block gives the hand Brier and ECE") {
    val s = spark
    import s.implicits._
    val perfect = (Seq.fill(5)((1.0, true)) ++ Seq.fill(5)((0.0, false)))
      .toDF("p", "y")
    val r0 = Calibrate.calibrationMetrics(perfect, "p", "y").head()
    assert(r0.getAs[Double]("brier") == 0.0)
    assert(r0.getAs[Double]("ece") == 0.0)
    // p = 0.8 on 10 rows, 4 true: Brier = (4*.04 + 6*.64)/10 = 0.4,
    // ECE = |0.8 - 0.4| = 0.4
    val over = (Seq.fill(4)((0.8, true)) ++ Seq.fill(6)((0.8, false)))
      .toDF("p", "y")
    val r1 = Calibrate.calibrationMetrics(over, "p", "y").head()
    assert(r1.getAs[Double]("brier") == 0.4)
    assert(r1.getAs[Double]("ece") == 0.4)
  }

  test("merkleRoots: content identity — same data same roots, one " +
    "changed doc moves only its group root and the corpus root") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "g1", "alpha"), (2L, "g1", "beta"),
      (3L, "g2", "gamma")).toDF("id", "grp", "txt")
    val b = Seq((1L, "g1", "alpha"), (2L, "g1", "CHANGED"),
      (3L, "g2", "gamma")).toDF("id", "grp", "txt")
    def roots(df: org.apache.spark.sql.DataFrame) =
      Provenance.merkleRoots(df, "grp", "id", "txt").collect()
        .map(r => r.getAs[String]("grp") -> r.getAs[String]("root"))
        .toMap
    val ra = roots(a)
    val ra2 = roots(a)
    val rb = roots(b)
    assert(ra == ra2, "roots must be deterministic")
    assert(ra("g2") == rb("g2"), "untouched group root moved")
    assert(ra("g1") != rb("g1"), "changed group root did not move")
    assert(ra("(corpus)") != rb("(corpus)"), "corpus root did not move")
  }

  test("kCore: pendant peels off a triangle at k=2; K4 is its own " +
    "3-core; over-aggressive k empties the graph") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r = GraphStats.kCore(e, "a", "b", k = 2, iters = 4).head()
    assert(r.getAs[Long]("n_nodes") == 3L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Boolean]("converged"))
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("a", "b")
    val r4 = GraphStats.kCore(k4, "a", "b", k = 3, iters = 2).head()
    assert(r4.getAs[Long]("n_nodes") == 4L &&
      r4.getAs[Long]("n_edges") == 6L && r4.getAs[Boolean]("converged"))
    val r5 = GraphStats.kCore(k4, "a", "b", k = 4, iters = 3).head()
    assert(r5.getAs[Long]("n_nodes") == 0L &&
      r5.getAs[Long]("n_edges") == 0L && r5.getAs[Boolean]("converged"))
  }
}
