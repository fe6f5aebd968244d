package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.TimeSeries

/** Streaming X196 must reproduce the batch CUSUM summary exactly over
  * the concatenated input, however the stream is cut — the whole walk
  * lives in four integers of keyed state.
  */
class StreamingCusumSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ob(key: String, i: Long, v: Double): StreamingCusum.Obs =
    StreamingCusum.Obs(key,
      new java.sql.Timestamp(1700000000000L + i * 1000), i, v)

  test("stateful streaming CUSUM == batch operator across batch cuts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // key "up" drifts above target late; key "flat" never alarms
    val all = (0L until 30L).map(i => ob("up",
      i, if (i < 20) 10.0 + (i % 3) else 18.5)) ++
      (0L until 30L).map(i => ob("flat", 100 + i, 9.0 + (i % 2)))
    val sorted = all.sortBy(_.seq)
    val cuts = Seq(sorted.take(17), sorted.slice(17, 43),
      sorted.drop(43))

    val mem = MemoryStream[StreamingCusum.Obs]
    val q = StreamingCusum.track(mem.toDS(), target = 11.0,
        slack = 1.0, threshold = 20.0)
      .writeStream.format("memory").queryName("cusum_parity_out")
      .outputMode("update").start()
    cuts.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // final snapshot per key = the row with the largest n_obs
    val got = s.table("cusum_parity_out").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (k, rows) =>
        val r = rows.maxBy(_.getAs[Long]("n_obs"))
        k -> ((r.getAs[Long]("n_obs"), r.getAs[Double]("s_max"),
          Option(r.getAs[java.lang.Long]("alarm_n")).map(_.longValue),
          Option(r.getAs[java.lang.Double]("s_at_alarm"))
            .map(_.doubleValue)))
      }

    val batchDf = s.createDataFrame(sorted.map(o =>
      (o.key, o.ts, o.seq, o.value))).toDF("key", "ts", "seq", "value")
    val want = TimeSeries.cusum(batchDf, "key", "value",
        Seq($"ts", $"seq"), target = 11.0, slack = 1.0,
        threshold = 20.0)
      .collect().map { r =>
        r.getAs[String]("key") -> ((r.getAs[Long]("n_obs"),
          r.getAs[Double]("s_max"),
          Option(r.getAs[java.lang.Long]("alarm_n")).map(_.longValue),
          Option(r.getAs[java.lang.Double]("s_at_alarm"))
            .map(_.doubleValue)))
      }.toMap

    assert(got == want, s"got=$got want=$want")
    // the drifting key did alarm; the flat key did not
    assert(got("up")._3.nonEmpty)
    assert(got("flat")._3.isEmpty)
  }
}
