package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.TimeSeries

/** Streaming X315 must reproduce the batch Page-Hinkley summary
  * exactly over the concatenated input, however the stream is cut —
  * the whole excursion walk lives in six integers of keyed state.
  */
class StreamingPageHinkleySpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ob(key: String, i: Long, v: Double)
      : StreamingPageHinkley.Obs =
    StreamingPageHinkley.Obs(key,
      new java.sql.Timestamp(1700000000000L + i * 1000), i, v)

  test("stateful streaming Page-Hinkley == batch operator across " +
    "batch cuts: same n, ph_max, argmax index, and alarm") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // "step" jumps at t=11; "flat" never moves
    val stepVals = (1 to 10).map(_ => 100L) ++ (1 to 10).map(_ => 200L)
    val flatVals = Seq.fill(12)(70L)
    val all = stepVals.zipWithIndex.map { case (v, i) =>
      ob("step", i + 1, v.toDouble) } ++
      flatVals.zipWithIndex.map { case (v, i) =>
        ob("flat", 100 + i, v.toDouble) }
    val sorted = all.sortBy(o => (o.key, o.seq))
    val cuts = Seq(sorted.take(9), sorted.slice(9, 23),
      sorted.drop(23))

    val mem = MemoryStream[StreamingPageHinkley.Obs]
    val q = StreamingPageHinkley.track(mem.toDS(), delta = 0.0,
        lambda = 100.0)
      .writeStream.format("memory").queryName("ph_parity_out")
      .outputMode("update").start()
    cuts.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val got = s.table("ph_parity_out").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (k, rows) =>
        val r = rows.maxBy(_.getAs[Long]("n"))
        k -> ((r.getAs[Long]("n"), r.getAs[Double]("ph_max"),
          r.getAs[Long]("ph_max_at"), r.getAs[Boolean]("alarm")))
      }

    def batch(vs: Seq[Long]): (Long, Double, Long, Boolean) = {
      val df = vs.zipWithIndex.map { case (v, i) => (i + 1, v) }
        .toDF("o", "v")
      val r = TimeSeries.pageHinkley(df, "o", "v", delta = 0.0,
        lambda = 100.0).head()
      (r.getAs[Long]("n"), r.getAs[Double]("ph_max"),
        r.getAs[Int]("ph_max_at").toLong, r.getAs[Boolean]("alarm"))
    }
    assert(got("step") == batch(stepVals))
    assert(got("flat") == batch(flatVals))
    assert(got("step")._4 && !got("flat")._4)
  }
}
