package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.Hll

/** Streaming X129: the cumulative per-group register-max merge over
  * micro-batches must equal the batch sketch over the concatenated
  * stream EXACTLY (elementwise max is associative and idempotent —
  * the portable-register rewrite has no promotion jitter) and track
  * the exact distinct counts within HLL error.
  */
class StreamingHllSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("streaming HLL estimates equal the whole-prefix batch sketch " +
    "exactly and the exact counts within HLL error") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val all = (0 until 2400).map(i => (s"g${i % 3}", s"u${(i * 7) % 530}"))
    val cuts = Seq(all.take(500), all.slice(500, 1700), all.drop(1700))

    val tracker = new StreamingHll.Tracker()
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("grp", "uid").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        tracker.update(batch, "grp", "uid")
        ()
      }.start()
    cuts.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val want = Hll.groupSketches(all.toDF("grp", "uid"), "grp", "uid")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("estimate")).toMap
    tracker.estimates().foreach { case (g, est) =>
      assert(est == want(g), s"$g: streaming $est vs batch ${want(g)}")
    }
    assert(tracker.estimates().keySet == want.keySet)
    // and the estimates track the exact distinct counts
    val exact = all.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.size.toLong }
    tracker.estimates().foreach { case (g, est) =>
      assert(math.abs(est - exact(g)).toDouble / exact(g) < 0.05,
        s"$g: $est vs ${exact(g)}")
    }
  }
}
