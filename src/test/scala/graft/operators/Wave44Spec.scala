package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkHarness

/** Wave 44 (X349–X352): Page's trend test, the Luhn PII gate, and
  * top-k churn (the TPC-H Q4/Q13/Q22 relational shapes are covered
  * by their contract queries + PlanAuditSpec).
  */
class Wave44Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  import spark.implicits._

  // ---- X349 pageTrendTest --------------------------------------------

  test("pageTrendTest: perfect monotone trend, hand-computed L=90, " +
    "z=3") {
    // 3 blocks x 4 ordered treatments, every block strictly increasing
    val rows = for {
      b <- 1L to 3L; j <- 1L to 4L
    } yield (b, j, (j * 10 + b).toDouble)
    val r = Hypothesis.pageTrendTest(rows.toDF("b", "t", "v"),
      "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3 && r.getAs[Long]("k") == 4)
    // L = n * sum(j*j) = 3 * 30 = 90
    assert(r.getAs[Double]("l_stat") == 90.0)
    // z = (12*90 - 3*3*4*25) / (4*5*sqrt(3*3)) = 180/60 = 3
    assert(r.getAs[Double]("z_stat") == 3.0)
  }

  test("pageTrendTest: reversed trend flips the sign; incomplete " +
    "blocks drop") {
    val rows = (for {
      b <- 1L to 3L; j <- 1L to 4L
    } yield (b, j, (100 - j * 10).toDouble)) :+ ((4L, 1L, 5.0))
    val r = Hypothesis.pageTrendTest(rows.toDF("b", "t", "v"),
      "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3) // block 4 incomplete
    assert(r.getAs[Double]("z_stat") == -3.0)
  }

  // ---- X350 luhnScan ---------------------------------------------------

  test("luhnScan: valid card numbers pass, off-by-one fails, short " +
    "runs are not candidates") {
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4532015112830366 now"),
      (2L, "broken 4111111111111112 here"),
      (3L, "order 123456789012 is only twelve digits"),
      (4L, "no digits at all")).toDF("doc_id", "text")
    val out = Privacy.luhnScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == ((2L, 2L)))
    assert(out(2L) == ((1L, 0L)))
    assert(out(3L) == ((0L, 0L)))
    assert(out(4L) == ((0L, 0L)))
  }

  test("luhnScan: the doubling walk is anchored at the RIGHT edge " +
    "(odd-length candidates)") {
    // 13-digit number: 0000000000018 -> digits from right: 8,1 ->
    // 8 + 2*1 = 10 -> valid
    val docs = Seq((1L, "x 0000000000018 y"),
      (2L, "x 0000000000017 y")).toDF("doc_id", "text")
    val out = Privacy.luhnScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L && out(2L) == 0L)
  }

  // ---- X352 topkChurn ----------------------------------------------------

  test("topkChurn: hand-built two-day overlap gives Jaccard 1/3") {
    val rows = Seq(
      ("2024-01-01 01:00:00", 1L), ("2024-01-01 02:00:00", 1L),
      ("2024-01-01 03:00:00", 2L),
      ("2024-01-02 01:00:00", 2L), ("2024-01-02 02:00:00", 2L),
      ("2024-01-02 03:00:00", 3L))
      .toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = Funnel.topkChurn(rows, "ts", "user_id", k = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("k_today") == 2 && r.getAs[Long]("k_prev") == 2)
    assert(r.getAs[Long]("n_shared") == 1)
    assert(r.getAs[Double]("jaccard") == 0.333333)
  }

  test("topkChurn: identical days give Jaccard 1, disjoint give 0") {
    val mk = (day: String, ids: Seq[Long]) => ids.zipWithIndex.map {
      case (id, h) => (s"$day 0$h:00:00", id)
    }
    val rows = (mk("2024-01-01", Seq(1, 2)) ++ mk("2024-01-02",
      Seq(1, 2)) ++ mk("2024-01-03", Seq(8, 9)))
      .toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = Funnel.topkChurn(rows, "ts", "user_id", k = 5)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Double]("jaccard")).toMap
    assert(out("2024-01-02") == 1.0)
    assert(out("2024-01-03") == 0.0)
  }

  test("topkChurn bounds the set at k with deterministic tiebreak") {
    // 3 users tie on one event each; k=2 keeps the lowest two ids
    val rows = Seq(("2024-01-01 01:00:00", 5L),
      ("2024-01-01 02:00:00", 3L), ("2024-01-01 03:00:00", 9L),
      ("2024-01-02 01:00:00", 3L), ("2024-01-02 02:00:00", 5L),
      ("2024-01-02 03:00:00", 9L))
      .toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = Funnel.topkChurn(rows, "ts", "user_id", k = 2).collect()
    assert(out(0).getAs[Long]("n_shared") == 2) // {3,5} both days
    assert(out(0).getAs[Double]("jaccard") == 1.0)
  }
}
