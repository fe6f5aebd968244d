package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Direct invariant specs for the two r11 kernels every migrated
  * operator leans on: the distributed cumSums prefix-sum scan (must
  * equal the single-task window form it replaced, long AND decimal)
  * and the one-pass GramAgg (must equal the exploded-self-join
  * covariance pipeline it replaced, including RAGGED vector lengths).
  */
class KernelParitySpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  test("cumSums == Window.orderBy cumulative sums on a multi-column " +
    "long/decimal grid across many partitions") {
    val rows = (1 to 500).map { i =>
      val v = ((i * 7919) % 997).toLong // distinct-ish grid keys
      (v, (i % 13).toLong, BigDecimal((i % 29) * 1000000L))
    }.distinct.map { case (v, c, m) => (v, c, m) }
    val df = rows.toDF("v", "c", "m")
      .withColumn("m", col("m").cast("decimal(38,0)"))
      .groupBy("v").agg(sum("c").as("c"),
        sum("m").cast("decimal(38,0)").as("m"))
      .repartition(16)
    val got = CorpusOps.cumSums(df, Seq(col("v")), Seq("c", "m"))
      .select(col("v"), col("__cumc"), col("__cumm")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("wc", sum(col("c")).over(w))
      .withColumn("wm", sum(col("m")).over(w))
      .select(col("v"), col("wc"), col("wm")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    assert(got.size == want.size)
    want.foreach { case (v, (wc, wm)) =>
      assert(got(v)._1 == wc, s"long cum mismatch at $v")
      assert(got(v)._2.compareTo(wm) == 0, s"decimal cum mismatch at $v")
    }
  }

  test("cumSums: empty input yields an empty frame; single row is " +
    "its own prefix") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "c")
    assert(CorpusOps.cumSums(empty, Seq(col("v")), Seq("c"))
      .collect().isEmpty)
    val one = Seq((5L, 7L)).toDF("v", "c")
    val r = CorpusOps.cumSums(one, Seq(col("v")), Seq("c")).collect()(0)
    assert(r.getLong(2) == 7L)
  }

  /** Spec-local replay of the pre-r11 effectiveRank pipeline (the
    * exploded-components self-join) — the parity oracle for GramAgg.
    */
  private def joinFormReplay(vecs: Seq[(Long, Seq[Double])])
      : (Long, Option[Double], Option[Double], Option[Double]) = {
    def quant(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    val comps = vecs.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, i) => (id, i, quant(x)) }
    }
    val cells = (for {
      (ida, i, qa) <- comps; (idb, j, qb) <- comps
      if ida == idb
    } yield ((i, j), (qa, qb)))
      .groupBy(_._1).map { case ((i, j), xs) =>
        val n = xs.size.toDouble
        val si = xs.map(_._2._1).map(BigInt(_)).sum.toDouble
        val sj = xs.map(_._2._2).map(BigInt(_)).sum.toDouble
        val sij = xs.map { case (_, (a, b)) => BigInt(a) * BigInt(b) }
          .sum.toDouble
        val cij = (sij / n - (si / n) * (sj / n)) / 1e12
        ((i, j), BigDecimal(cij * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    if (cells.isEmpty) return (0L, None, None, None)
    val tr = cells.collect { case ((i, j), cn) if i == j => cn }.sum
    val fr = cells.values.map(c => BigInt(c) * BigInt(c)).sum
    val d2 = cells.size.toLong
    val frD = fr.toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (math.sqrt(d2.toDouble).toLong, Some(r6(tr.toDouble / 1e9)),
      Some(r6(frD / 1e18)),
      if (fr > 0) Some(r6(tr.toDouble * tr.toDouble / frD)) else None)
  }

  private def runGram(vecs: Seq[(Long, Seq[Double])]) = {
    val df = vecs.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))
    val r = Similarity.effectiveRank(df.repartition(8), "id", "vec")
      .collect()(0)
    def opt(i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), opt(1), opt(2), opt(3))
  }

  test("GramAgg == the join-form replay on random fixed-length " +
    "vectors") {
    val rng = new scala.util.Random(42)
    val vecs = (1L to 40L).map(i =>
      (i, Seq.fill(6)((rng.nextDouble() - 0.5).toFloat.toDouble)))
    assert(runGram(vecs) == joinFormReplay(vecs))
  }

  test("GramAgg == the join-form replay on RAGGED vector lengths " +
    "(the per-cell restricted counts path)") {
    val rng = new scala.util.Random(7)
    val vecs = (1L to 30L).map { i =>
      val len = 2 + (i % 4).toInt // lengths 2..5 interleaved
      (i, Seq.fill(len)((rng.nextDouble() - 0.5).toFloat.toDouble))
    }
    assert(runGram(vecs) == joinFormReplay(vecs))
  }

  test("vec_sqdist_l == aggregate(zip_with(...)) integer fold, " +
    "incl. negative components and length mismatch (min-length)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (Seq.fill(16)(rng.nextLong() % 2000000L),
        Seq.fill(if (i % 7 == 0) 12 else 16)(rng.nextLong() % 2000000L))
    }
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(
        slice(col("a"), lit(1), least(size(col("a")), size(col("b")))),
        slice(col("b"), lit(1), least(size(col("a")), size(col("b")))),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val got = df.select(
      Similarity.sqDistL(col("a"), col("b")).as("k"), hof.as("h"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
