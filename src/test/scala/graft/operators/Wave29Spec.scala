package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 29: X292 Dunning collocations, X293 G-test, X294
  * Theil's U, X295 Goodman-Kruskal gamma.
  */
class Wave29Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("collocations: a welded pair dominates G2 over frequent-but-" +
    "independent words; minCount filters; n_pair/margins are exact") {
    val s = spark
    import s.implicits._
    // 'new york' always adjacent; 'the' frequent but free-floating
    val docs = (1 to 20).map(i =>
      s"the cat new york saw the dog new york and the bird") ++
      (1 to 5).map(_ => "rare pair rare pair")
    val r = CorpusOps.collocations(docs.toDF("text"), "text",
      minCount = 5L, topK = 10).collect()
    val top = r.head
    assert(top.getAs[String]("w1") == "new" &&
      top.getAs[String]("w2") == "york")
    assert(top.getAs[Long]("n_pair") == 40L)
    assert(top.getAs[Long]("n_w1") == 40L) // 'new' only precedes york
    // every surviving bigram meets the count floor
    assert(r.forall(_.getAs[Long]("n_pair") >= 5L))
    // g2 ordering is descending on the rounded value
    val g2s = r.map(_.getAs[Double]("g2")).toSeq
    assert(g2s == g2s.sorted.reverse)
  }

  test("gTest: independence scores exactly 0; G = 2N*MI identity on " +
    "a dependent table; dof = (r-1)(c-1)") {
    val s = spark
    import s.implicits._
    // perfectly independent 2x2: counts proportional to margins
    val indep = (Seq.fill(8)(("a", "u")) ++ Seq.fill(2)(("a", "v")) ++
      Seq.fill(4)(("b", "u")) ++ Seq.fill(1)(("b", "v")))
      .toDF("x", "y")
    val ri = CorpusOps.gTest(indep, "x", "y").head()
    assert(ri.getAs[Double]("g_stat") == 0.0)
    assert(ri.getAs[Long]("dof") == 1L)
    // dependent: x == y diagonal
    val dep = (Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b")) ++
      Seq.fill(2)(("a", "b"))).toDF("x", "y")
    val g = CorpusOps.gTest(dep, "x", "y").head().getAs[Double]("g_stat")
    val mi = CorpusOps.mutualInformation(dep, "x", "y").head()
      .getAs[Double]("mi_nats")
    assert(math.abs(g - 2.0 * 22 * mi) < 2e-5, s"g=$g mi=$mi")
    assert(g > 10.0)
  }

  test("theilU: a function x = f(y) gives U(x|y) = 1 but U(y|x) < 1 " +
    "when y is finer; independence gives 0 both ways") {
    val s = spark
    import s.implicits._
    // y in {1,2,3,4}, x = y mod 2: knowing y pins x; knowing x halves y
    val f = (1 to 4).flatMap(y => Seq.fill(5)((y % 2, y)))
      .toDF("x", "y")
    val t = CorpusOps.theilU(f, "x", "y").head()
    assert(t.getAs[Double]("u_x_given_y") == 1.0)
    assert(t.getAs[Double]("u_y_given_x") == 0.5)
    val indep = (for { x <- Seq("a", "b"); y <- Seq("u", "v");
      _ <- 1 to 3 } yield (x, y)).toDF("x", "y")
    val i = CorpusOps.theilU(indep, "x", "y").head()
    assert(i.getAs[Double]("u_x_given_y") == 0.0)
    assert(i.getAs[Double]("u_y_given_x") == 0.0)
  }

  test("gkGamma: monotone bands -> +1, reversed -> -1, hand mixed " +
    "case 0.5; ties carry no vote") {
    val s = spark
    import s.implicits._
    val mono = Seq((0, 0), (0, 0), (1, 1), (2, 2)).toDF("x", "y")
    assert(CorpusOps.gkGamma(mono, "x", "y").head()
      .getAs[Double]("gamma") == 1.0)
    val rev = Seq((0, 2), (1, 1), (2, 0)).toDF("x", "y")
    assert(CorpusOps.gkGamma(rev, "x", "y").head()
      .getAs[Double]("gamma") == -1.0)
    // C: (0,0)x(1,1), (0,0)x(2,2), (1,1)x(2,2) with one (0,2) spoiler:
    // cells (0,0):1 (1,1):1 (2,2):1 (0,2):1 ->
    // conc pairs: (0,0)-(1,1), (0,0)-(2,2), (1,1)-(2,2) = 3
    // disc: (0,2)-(1,1), (0,2)-(2,2)... y decreasing: (0,2)x(1,1): x
    // 0<1, y 2>1 disc; (0,2)x(2,2): y tie -> no vote => C=3, D=1 ->
    // wait (0,2)x(2,2) ties on y: dropped. gamma = (3-1)/4 = 0.5
    val mixed = Seq((0, 0), (1, 1), (2, 2), (0, 2)).toDF("x", "y")
    val m = CorpusOps.gkGamma(mixed, "x", "y").head()
    assert(m.getAs[Long]("concordant") == 3L)
    assert(m.getAs[Long]("discordant") == 1L)
    assert(m.getAs[Double]("gamma") == 0.5)
    // all ties -> NULL
    val tied = Seq((1, 1), (1, 1)).toDF("x", "y")
    val tr = CorpusOps.gkGamma(tied, "x", "y").head()
    assert(tr.isNullAt(tr.fieldIndex("gamma")))
  }
}
