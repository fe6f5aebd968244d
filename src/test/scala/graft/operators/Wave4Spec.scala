package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** r10 wave 4: X193 TextRank composition, X195 RFM, X196 CUSUM,
  * X197 LSH planner.
  */
class Wave4Spec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("cusum: hand-computed shift alarm, dip-resets-to-zero " +
    "recurrence law, and NULL columns when never crossing") {
    val s = spark
    import s.implicits._
    // target+slack = 10; values jump to 15 -> z = 5 each;
    // S walks 0,0,0,5,10,15 -> first S > 12 at n = 6
    val df = Seq(10.0, 10.0, 10.0, 15.0, 15.0, 15.0).zipWithIndex
      .map { case (v, i) => ("k", i, v) }.toDF("g", "ord", "v")
    val r = TimeSeries.cusum(df, "g", "v", Seq($"ord"),
      target = 10.0, slack = 0.0, threshold = 12.0).head()
    assert(r.getAs[Long]("alarm_n") == 6L)
    assert(r.getAs[Double]("s_at_alarm") == 15.0)
    assert(r.getAs[Double]("s_max") == 15.0)
    // dip then rise: S = max(0, S+z) resets at the floor —
    // [5, 15] gives S = [0, 5], never the raw cumsum [-5, 0]
    val d2 = Seq(("k", 1, 5.0), ("k", 2, 15.0)).toDF("g", "ord", "v")
    val r2 = TimeSeries.cusum(d2, "g", "v", Seq($"ord"),
      target = 10.0, slack = 0.0, threshold = 100.0).head()
    assert(r2.getAs[Double]("s_max") == 5.0)
    assert(r2.isNullAt(r2.fieldIndex("alarm_n")))
    assert(r2.isNullAt(r2.fieldIndex("s_at_alarm")))
  }

  test("rfm: five separable customers land in five quintiles; best " +
    "scores 555, worst 111") {
    val s = spark
    import s.implicits._
    // customer i: i orders, price 10*i each, last order on day i
    val orders = (1 to 5).flatMap { i =>
      (1 to i).map(j =>
        (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0$i 00:00:00"),
          10.0 * i))
    }.toDF("cust", "d", "amt")
    val out = Funnel.rfm(orders, "cust", "d", "amt").collect()
      .map(r => r.getAs[Long]("cust") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Long]("rfm_code"))).toMap
    assert(out(5L) == (0L, 5L, 555L))
    assert(out(1L) == (4L, 1L, 111L))
    assert(out(3L)._3 == 333L)
  }

  test("lshPlan: closed-form spot checks and S-curve monotonicity") {
    val s = spark
    import s.implicits._
    val grid = Dedup.lshPlan(spark).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Int]("b"),
        r.getAs[Double]("s")) ->
        (r.getAs[Double]("p_collision"), r.getAs[Double]("s_threshold")))
      .toMap
    assert(grid.size == 8 * 5 * 9)
    // r=1, b=4, s=0.5: 1 - 0.5^4 = 0.9375
    assert(grid((1, 4, 0.5))._1 == 0.9375)
    // r=4, b=16: threshold (1/16)^(1/4) = 0.5
    assert(math.abs(grid((4, 16, 0.1))._2 - 0.5) < 1e-6)
    // collision probability rises with s for fixed (r, b)
    val curve = (1 to 9).map(i => grid((4, 16, i / 10.0))._1)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
  }

  test("textrank composition: the hub word of a star-shaped " +
    "co-occurrence graph outranks every spoke") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hub aa hub bb hub cc hub dd")).toDF("id", "t")
    val pairs = Dedup.explodedShingles(docs, "id", "t", k = 2)
      .select(org.apache.spark.sql.functions.split($"g", Dedup.Sep)
        .as("__p"))
      .select($"__p".getItem(0).as("src"), $"__p".getItem(1).as("dst"))
      .filter($"src" =!= $"dst").distinct()
    val sym = pairs.union(pairs.select($"dst".as("src"),
      $"src".as("dst")))
    val ranks = PageRank.run(sym, "src", "dst", iters = 10,
        symmetric = true)
      .collect().map(r => r.getAs[String]("node") ->
        r.getAs[Long]("rank")).toMap
    assert(Seq("aa", "bb", "cc", "dd").forall(w =>
      ranks("hub") > ranks(w)), s"hub not dominant: $ranks")
  }
}
