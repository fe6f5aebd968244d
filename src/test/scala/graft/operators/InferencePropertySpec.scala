package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.{PropertyHarness, SparkHarness}

/** Cross-operator laws for the r12 inference shelf (waves 53–58) —
  * properties that hold for ANY input, checked over randomized
  * fixtures: procedure dominance (Hochberg ≤ Holm ≤ Bonferroni),
  * Kuiper ≥ KS by construction, Fisher p ∈ (0,1], ERR monotonicity
  * under a grade upgrade, and raking's margin fixed point.
  */
class InferencePropertySpec extends AnyFunSuite with PropertyHarness {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  test("property: Hochberg adjusted p never exceeds Holm's on the " +
    "same family, and both cap at 1") {
    val genP = Gen.listOfN(6, Gen.choose(1, 999).map(_ / 1000.0))
    forAllSampled(genP, n = 40) { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => (s"k$i", p) }
        .toDF("k", "p")
      val hoch = Hypothesis.hochbergAdjust(df, "k", "p").collect()
        .map(r => r.getAs[String]("k") -> r.getAs[Double]("p_adj"))
        .toMap
      val holm = Hypothesis.holmAdjust(df, "k", "p").collect()
        .map(r => r.getAs[String]("k") -> r.getAs[Double]("p_adj"))
        .toMap
      hoch.foreach { case (k, v) =>
        assert(v <= holm(k) + 1e-9, s"hochberg($k)=$v > holm=${holm(k)}")
        assert(v <= 1.0 && v > 0.0)
      }
    }
  }

  test("property: Kuiper V >= KS D on any two-sample split, and " +
    "both live in [0,1]") {
    val genVals = Gen.listOfN(24,
      Gen.zip(Gen.choose(0, 40), Gen.oneOf(true, false)))
    forAllSampled(genVals, n = 25) { vs =>
      // ensure both groups are non-empty
      val fixed = (vs :+ ((41, true)) :+ ((42, false)))
      val df = fixed.zipWithIndex.map { case ((v, a), i) =>
        (v.toDouble, i.toLong, a)
      }.toDF("v", "id", "a")
      val ks = Hypothesis.ksTest(df, "v", col("a")).collect()(0)
        .getAs[Double]("ks_d")
      val ku = Hypothesis.kuiperTest(df, "v", col("a")).collect()(0)
      val v = ku.getAs[Double]("kuiper_v")
      assert(v >= ks - 1e-9, s"V=$v < D=$ks")
      assert(v >= 0.0 && v <= 2.0 + 1e-9)
      assert(ks >= 0.0 && ks <= 1.0 + 1e-9)
    }
  }

  test("property: Fisher exact p is in (0, 1] and equals 1 on " +
    "degenerate margins") {
    val genCell = Gen.choose(0, 12)
    forAllSampled(Gen.listOfN(4, genCell), n = 60) { cells =>
      val Seq(a, b, c, d) = cells.map(_.toLong)
      if (a + b + c + d > 0) {
        val rows = Seq.fill(a.toInt)(("g", true, true)) ++
          Seq.fill(b.toInt)(("g", true, false)) ++
          Seq.fill(c.toInt)(("g", false, true)) ++
          Seq.fill(d.toInt)(("g", false, false))
        val p = Hypothesis.fisherExact(rows.toDF("g", "e", "y"),
          "g", col("e"), col("y")).collect()(0)
          .getAs[Double]("p_two_sided")
        assert(p > 0.0 && p <= 1.0 + 1e-9, s"p=$p for $cells")
        // empty row/column margin -> only one attainable table -> p = 1
        if (a + b == 0 || c + d == 0 || a + c == 0 || b + d == 0)
          assert(p == 1.0, s"degenerate margin should give 1: $cells")
      }
    }
  }

  test("property: upgrading one grade never lowers ERR@k, and ERR " +
    "is within (0, 1)") {
    val genGrades = Gen.listOfN(5, Gen.choose(0, 4))
    forAllSampled(Gen.zip(genGrades, Gen.choose(0, 4)), n = 60) {
      case (grades, pos) =>
        if (grades(pos) < 4) {
          def err(gs: Seq[Int]): Double = {
            val df = gs.zipWithIndex.map { case (g, i) =>
              ("q", i + 1, g)
            }.toDF("qid", "rank", "grade")
            RankEval.errAtK(df, "qid", "rank", "grade", k = 5)
              .collect()(0).getAs[Double]("err")
          }
          val base = err(grades)
          val upgraded = err(grades.updated(pos, grades(pos) + 1))
          assert(upgraded >= base - 1e-9,
            s"upgrade at $pos lowered ERR: $grades $base -> $upgraded")
          assert(base >= 0.0 && base < 1.0)
        }
    }
  }

  test("property: raked masses hit uniform row and column margins " +
    "within grid tolerance on random positive tables") {
    val genTable = Gen.listOfN(4, Gen.choose(1, 30))
    forAllSampled(genTable, n = 15) { ns =>
      val rows = Seq("a", "b").flatMap { r =>
        Seq("x", "y").flatMap { c =>
          val n = ns(Seq("a", "b").indexOf(r) * 2 +
            Seq("x", "y").indexOf(c))
          Seq.fill(n)((r, c))
        }
      }
      val out = DistStats.rakeWeights(rows.toDF("r", "c"), "r", "c",
        iters = 12).collect()
      val total = rows.size.toLong * 1000000L
      val byRow = out.groupBy(_.getAs[String]("r")).map { case (_, g) =>
        g.map(x => x.getAs[Long]("n") * x.getAs[Long]("w_micro")).sum
      }
      byRow.foreach(m =>
        assert(math.abs(m - total / 2) < total / 100,
          s"row mass $m vs ${total / 2} for $ns"))
      val byCol = out.groupBy(_.getAs[String]("c")).map { case (_, g) =>
        g.map(x => x.getAs[Long]("n") * x.getAs[Long]("w_micro")).sum
      }
      byCol.foreach(m =>
        assert(math.abs(m - total / 2) < total / 100,
          s"col mass $m vs ${total / 2} for $ns"))
    }
  }
}