package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r9 wave 8: X159 stochastic-greedy facility-location coreset
  * selection.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.95f, 0.05f)),
    (5L, Array(0.0f, 0.0f, 1.0f)),
    (6L, Array(0.5f, 0.5f, 0.0f)))

  /** Exact greedy reference (full candidate set, same tie rule). */
  private def referenceGreedy(k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    var cov = vecs.map(_._1 -> 0.0).toMap
    var picked = Seq.empty[Long]
    (1 to k).foreach { _ =>
      val cands = vecs.filterNot(v => picked.contains(v._1))
      val scored = cands.map { case (cid, cv) =>
        cid -> vecs.map { case (j, vj) =>
          math.max(cos(vj, cv) - cov(j), 0.0)
        }.sum
      }
      val (best, _) = scored.maxBy { case (cid, g) => (g, -cid) }
      val bv = vecs.find(_._1 == best).get._2
      cov = vecs.map { case (j, vj) =>
        j -> math.max(cov(j), cos(vj, bv))
      }.toMap
      picked = picked :+ best
    }
    picked
  }

  test("full-candidate coresetSelect reproduces exact greedy picks " +
    "with monotone coverage") {
    val s = spark
    import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.coresetSelect(df, "vec_id", "embedding",
        k = 3, candidatesPerRound = 100)
      .orderBy("selection_rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == referenceGreedy(3))
    val cov = out.map(_.getAs[Double]("mean_coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a },
      s"coverage not monotone: ${cov.toSeq}")
    // round 1 gain is the full similarity mass of the first pick;
    // later marginal gains can only shrink in this geometry
    val gains = out.map(_.getAs[Double]("marginal_gain"))
    assert(gains.head == gains.max)
  }

  test("coresetSelect is deterministic and stops when the corpus " +
    "is exhausted") {
    val s = spark
    import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val a = Similarity.coresetSelect(df, "vec_id", "embedding",
      k = 10, candidatesPerRound = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.coresetSelect(df, "vec_id", "embedding",
      k = 10, candidatesPerRound = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == 6) // only 6 vectors exist
  }

  test("stochastic draw restricts candidates but still covers: picks " +
    "are distinct and coverage approaches full-greedy coverage") {
    val s = spark
    import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.coresetSelect(df, "vec_id", "embedding",
        k = 3, candidatesPerRound = 2)
      .orderBy("selection_rank").collect()
    val ids = out.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    assert(out.last.getAs[Double]("mean_coverage") > 0.8)
  }
}
