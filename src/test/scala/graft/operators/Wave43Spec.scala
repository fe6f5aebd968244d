package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 43 (X343–X348): MATTR, term burstiness, partial correlation,
  * Lin's CCC, the odds-ratio panel, and the Quade test.
  */
class Wave43Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X343 mattr ----------------------------------------------------

  test("mattr: hand-computed windows, short-doc TTR fallback, " +
    "repetition lowers it") {
    val docs = Seq((1L, "a b a b"), (2L, "a a a"), (3L, "a b"),
      (4L, "a a b b")).toDF("doc_id", "text")
    val out = CorpusOps.mattr(docs, "doc_id", "text", window = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 3L, 1.0)))      // [ab][ba][ab] all distinct
    assert(out(2L) == ((3L, 2L, 0.5)))      // [aa][aa]
    assert(out(3L) == ((2L, 1L, 1.0)))      // shorter than window: TTR
    assert(out(4L) == ((4L, 3L, 0.666667))) // [aa][ab][bb] -> 4/6
  }

  test("mattr is length-stable where raw TTR is not") {
    // same local diversity, 10x the length: mattr stays put
    val unit = "a b c d e "
    val docs = Seq((1L, unit * 2), (2L, unit * 20)).toDF("doc_id", "text")
    val out = CorpusOps.mattr(docs, "doc_id", "text", window = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
  }

  // ---- X344 termBurstiness -------------------------------------------

  test("termBurstiness: hand-computed E[tf|tf>0] and VMR") {
    val docs = Seq((1L, "x x x"), (2L, "y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = CorpusOps.termBurstiness(docs, "doc_id", "text",
        minDf = 2, topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // x: df 2, tf 4, tf2 10 -> burst 2, vmr (14/9)/(4/3) = 7/6
    assert(out("x") == ((2L, 4L, 2.0, 1.166667)))
    // y: df 2, tf 2, tf2 2 -> burst 1, vmr (2/9)/(2/3) = 1/3
    assert(out("y") == ((2L, 2L, 1.0, 0.333333)))
  }

  test("termBurstiness: a Poisson-ish spread term reads VMR near 1, " +
    "below a clumped one") {
    val docs = (Seq.fill(8)("glue") ++ Seq("topic topic topic topic",
      "", "", "", "", "", "", "")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = CorpusOps.termBurstiness(docs, "doc_id", "text",
        minDf = 1, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("topic") > out("glue"))
  }

  // ---- X345 partialCorrelation ---------------------------------------

  test("partialCorrelation: y = x + z with x orthogonal to z gives " +
    "r_partial exactly 1; controlling a perfect copy gives NULL") {
    val rows = for (x <- Seq(0.0, 1.0); z <- Seq(0.0, 10.0))
      yield (x, x + z, z)
    val r = Hypothesis.partialCorrelation(rows.toDF("x", "y", "z"),
      "x", "y", "z").collect()(0)
    assert(r.getAs[Double]("r_xz") == 0.0)
    assert(r.getAs[Double]("r_partial") == 1.0)
    val copy = Seq((1.0, 2.0, 1.0), (2.0, 3.0, 2.0), (3.0, 5.0, 3.0))
      .toDF("x", "y", "z")
    val r2 = Hypothesis.partialCorrelation(copy, "x", "y", "z")
      .collect()(0)
    assert(r2.getAs[Double]("r_xz") == 1.0)
    assert(r2.isNullAt(r2.fieldIndex("r_partial")))
  }

  // ---- X346 linsCcc ----------------------------------------------------

  test("linsCcc: identity agreement is 1; a location shift collapses " +
    "ccc while Pearson stays 1") {
    val same = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r = Hypothesis.linsCcc(same, "x", "y").collect()(0)
    assert(r.getAs[Double]("pearson_r") == 1.0 &&
      r.getAs[Double]("ccc") == 1.0)
    val shifted = Seq((0.0, 10.0), (2.0, 12.0)).toDF("x", "y")
    val r2 = Hypothesis.linsCcc(shifted, "x", "y").collect()(0)
    assert(r2.getAs[Double]("pearson_r") == 1.0)
    assert(r2.getAs[Double]("ccc") == 0.019608) // 2/(1+1+100)
    assert(r2.getAs[Double]("mean_x") == 1.0 &&
      r2.getAs[Double]("mean_y") == 11.0)
  }

  // ---- X347 oddsRatio --------------------------------------------------

  test("oddsRatio: hand-computed OR 4, RR 3, and the Wald CIs") {
    val rows =
      Seq.fill(10)((true, true)) ++ Seq.fill(20)((true, false)) ++
        Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false))
    val r = Hypothesis.oddsRatio(rows.toDF("e", "o"), col("e"),
      col("o")).collect()(0)
    assert(r.getAs[Double]("odds_ratio") == 4.0)
    assert(r.getAs[Double]("rel_risk") == 3.0)
    val se = math.sqrt(1.0 / 10 + 1.0 / 20 + 1.0 / 5 + 1.0 / 40)
    assert(math.abs(r.getAs[Double]("or_lo") -
      math.exp(math.log(4.0) - 1.959964 * se)) < 1e-6)
    assert(math.abs(r.getAs[Double]("or_hi") -
      math.exp(math.log(4.0) + 1.959964 * se)) < 1e-6)
  }

  test("oddsRatio: an empty cell nulls the OR, keeps the counts") {
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(4)((false, false))
    val r = Hypothesis.oddsRatio(rows.toDF("e", "o"), col("e"),
      col("o")).collect()(0)
    assert(r.getAs[Long]("n_exp_pos") == 3 &&
      r.getAs[Long]("n_unexp_neg") == 4)
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
  }

  // ---- X348 quadeTest ---------------------------------------------------

  test("quadeTest: hand-worked 3x3 design (A=28, B=24 -> F=12)") {
    // identical within-block orderings, ranges 2/4/6 -> weights 1/2/3
    val rows = Seq(
      (1L, "t1", 1.0), (1L, "t2", 2.0), (1L, "t3", 3.0),
      (2L, "t1", 2.0), (2L, "t2", 4.0), (2L, "t3", 6.0),
      (3L, "t1", 3.0), (3L, "t2", 6.0), (3L, "t3", 9.0))
      .toDF("b", "t", "v")
    val r = Hypothesis.quadeTest(rows, "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3 && r.getAs[Long]("k") == 3)
    assert(r.getAs[Long]("df1") == 2 && r.getAs[Long]("df2") == 4)
    assert(r.getAs[Double]("f_stat") == 12.0)
  }

  test("quadeTest drops incomplete blocks and nulls on perfect " +
    "degeneracy") {
    val rows = Seq(
      (1L, "t1", 1.0), (1L, "t2", 2.0),
      (2L, "t1", 1.0), (2L, "t2", 2.0),
      (3L, "t1", 5.0)) // incomplete
      .toDF("b", "t", "v")
    val r = Hypothesis.quadeTest(rows, "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("n_dropped_blocks") == 1)
    assert(r.getAs[Long]("n_blocks") == 2)
    // both kept blocks agree perfectly: A == B -> F degenerate
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }
}
