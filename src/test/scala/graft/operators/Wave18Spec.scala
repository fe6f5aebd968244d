package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 18: X255 compaction planner, X256 salt plan, X257 MMR.
  */
class Wave18Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("Compaction.plan: FFD-order packing — oversized files sit " +
    "alone, every group total < target + its largest file") {
    val s = spark
    import s.implicits._
    val files = Seq(("a", 12L), ("b", 6L), ("c", 5L), ("d", 4L),
      ("e", 3L)).toDF("path", "bytes")
    val r = Compaction.plan(files, "path", "bytes", targetBytes = 10L)
      .collect().map(x => x.getAs[String]("path") ->
        x.getAs[Long]("output_group")).toMap
    assert(r("a") == 0L) // 12 >= target: alone
    assert(r("b") == 1L && r("c") == 1L) // 6+5 = 11 < 10+6
    assert(r("d") == 2L && r("e") == 2L)
    // law on a bigger deterministic inventory
    val inv = (1 to 200).map(i => (s"f$i", (i * 37 % 97 + 1).toLong))
      .toDF("path", "bytes")
    val groups = Compaction.plan(inv, "path", "bytes", 150L)
      .collect()
      .groupBy(_.getAs[Long]("output_group"))
      .map { case (_, rows) =>
        (rows.map(_.getAs[Long]("bytes")).sum,
          rows.map(_.getAs[Long]("bytes")).max)
      }
    groups.foreach { case (tot, mx) =>
      assert(tot < 150L + mx, s"group total $tot breaks the bound")
    }
  }

  test("saltPlan: only keys above the per-task target appear, with " +
    "integer-exact ceil factors") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(120)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(51)("c")).toDF("k")
    val r = SaltedJoin.saltPlan(df, "k", targetPerTask = 50L)
      .collect().map(x => x.getAs[String]("k") ->
        x.getAs[Long]("salt_factor")).toMap
    assert(r == Map("a" -> 3L, "c" -> 2L)) // ceil(120/50), ceil(51/50)
  }

  test("mmrSelect: rank 1 is pure relevance; a low lambda suppresses " +
    "the exact duplicate in favor of the diverse candidate") {
    val s = spark
    import s.implicits._
    val e0 = Array.tabulate(4)(i => if (i == 0) 1.0f else 0.0f)
    val vecs = Seq(
      (1L, e0), (2L, e0),
      (3L, Array(0.8f, 0.6f, 0f, 0f))).toDF("vec_id", "embedding")
    val q = Array(1.0, 0.0, 0.0, 0.0)
    val r = Similarity.mmrSelect(vecs, "vec_id", "embedding", q,
      k = 3, lambda = 0.3, poolSize = 3).collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    assert(r.head.getAs[Double]("relevance") == 1.0)
    // high lambda keeps pure-relevance order instead
    val hi = Similarity.mmrSelect(vecs, "vec_id", "embedding", q,
      k = 2, lambda = 1.0, poolSize = 3).collect()
    assert(hi.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
  }
}
