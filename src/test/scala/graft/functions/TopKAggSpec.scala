package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** TopKAgg: equality with the window row_number form across
  * partitionings (merge-order insensitivity), and the plan shape
  * that makes it worth having — a partial aggregate before the
  * exchange.
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def topk(k: Int) = F.udaf(new TopKAgg(k),
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  test("agg == window row_number twin, any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // duplicate values force the id tiebreak to matter
    val rows = (0 until 4000).map(i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 50) / 10.0, i.toLong))
    for (parts <- Seq(1, 13, 32)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = df.groupBy($"g").agg(topk(3)($"v", $"id").as("tk"))
        .select($"g", F.posexplode($"tk"))
        .select($"g", ($"pos" + 1).as("rk"), $"col._1".as("v"),
          $"col._2".as("id"))
        .as[(String, Int, Double, Long)].collect().toSet
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val want = df.withColumn("rk", F.row_number().over(w))
        .filter($"rk" <= 3)
        .select($"g", $"rk", $"v", $"id")
        .as[(String, Int, Double, Long)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("NaN ranks above every value, like the window's ORDER BY desc") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", Double.NaN, 2L), ("a", 5.0, 3L),
      ("a", Double.NaN, 4L)).toDF("g", "v", "id").repartition(3)
    val got = df.groupBy($"g").agg(topk(3)($"v", $"id").as("tk"))
      .select(F.posexplode($"tk"))
      .select($"col._2").as[Long].collect().toSeq
    // NaN rows first (id tiebreak), then the largest finite value
    assert(got == Seq(2L, 4L, 3L), got.toString)
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val want = df.withColumn("rk", F.row_number().over(w))
      .filter($"rk" <= 3).orderBy($"rk")
      .select($"id").as[Long].collect().toSeq
    assert(got == want, s"agg $got vs window $want")
  }

  test("groups smaller than k yield all their rows") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "v", "id")
    val got = df.groupBy($"g").agg(topk(5)($"v", $"id").as("tk"))
      .select(F.size($"tk")).as[Int].head()
    assert(got == 2)
  }

  test("plan has a partial aggregate before the exchange") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(8)
    val plan = df.groupBy($"g").agg(topk(2)($"v", $"id").as("tk"))
      .queryExecution.executedPlan.toString
    // typed aggregators plan as ObjectHashAggregate: partial + final
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(plan.contains("Exchange"), plan)
  }
}
