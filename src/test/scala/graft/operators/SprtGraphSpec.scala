package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 2: X189 SPRT replay, X190 triangle stats. */
class SprtGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  // p0=0.3, p1=0.5, alpha=0.05, beta=0.2:
  // c1 = ln(5/3) = 0.5108, c0 = ln(5/7) = -0.3365
  // A = ln(16) = 2.7726, B = ln(0.2/0.95) = -1.5581

  test("sprt: all-success group accepts H1 at the exact Wald " +
    "crossing; all-failure accepts H0; mixed short walk continues") {
    val s = spark
    import s.implicits._
    val rows =
      (1 to 10).map(i => ("up", i, true)) ++
        (1 to 10).map(i => ("down", i, false)) ++
        Seq(("mix", 1, true), ("mix", 2, false), ("mix", 3, true))
    val df = rows.toDF("g", "ord", "ok")
    val out = Hypothesis.sprt(df, "g", $"ok", Seq($"ord"),
      p0 = 0.3, p1 = 0.5).collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[String]("decision"), r.getAs[Long]("n_trials"),
          r.getAs[Long]("successes"), r.getAs[Double]("llr"))).toMap
    // ceil(2.7726/0.5108) = 6 successes to cross A
    val up = out("up")
    assert(up._1 == "accept_h1" && up._2 == 6L && up._3 == 6L)
    assert(math.abs(up._4 - 6 * math.log(0.5 / 0.3)) < 1e-5)
    // ceil(1.5581/0.3365) = 5 failures to cross B
    val down = out("down")
    assert(down._1 == "accept_h0" && down._2 == 5L && down._3 == 0L)
    val mix = out("mix")
    assert(mix._1 == "continue" && mix._2 == 3L && mix._3 == 2L)
  }

  test("sprt crossing follows the ORDER column, not input order") {
    val s = spark
    import s.implicits._
    // reversed insertion order; by ord the first 5 are failures ->
    // H0 at n=5 even though successes arrive first in the data
    val rows = Seq(("g", 6, true), ("g", 7, true), ("g", 8, true)) ++
      (1 to 5).map(i => ("g", i, false))
    val r = Hypothesis.sprt(rows.toDF("g", "ord", "ok"), "g", $"ok",
      Seq($"ord"), p0 = 0.3, p1 = 0.5).head()
    assert(r.getAs[String]("decision") == "accept_h0")
    assert(r.getAs[Long]("n_trials") == 5L)
  }

  test("triangleStats: hand graph with one triangle and a pendant; " +
    "reversed/duplicate edges canonicalize; K4 is fully transitive") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus pendant 3-4, with noise dupes
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L),
      (3L, 2L)).toDF("a", "b")
    val r = GraphStats.triangleStats(e, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    // degrees 2,2,3,1 -> wedges = (2+2+6+0)/2 = 5; coeff = 3/5
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Double]("clustering_coeff") == 0.6)
    // path graph: no triangles, coefficient 0
    val path = GraphStats.triangleStats(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b"), "a", "b").head()
    assert(path.getAs[Long]("n_triangles") == 0L)
    assert(path.getAs[Double]("clustering_coeff") == 0.0)
    // K4: 4 triangles, 12 wedges, coefficient 1
    val k4 = GraphStats.triangleStats(
      (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
        .toDF("a", "b"), "a", "b").head()
    assert(k4.getAs[Long]("n_triangles") == 4L)
    assert(k4.getAs[Double]("clustering_coeff") == 1.0)
  }
}
