package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.CorpusOps

/** Streaming X131: the cumulative PSI after N micro-batches must
  * equal the batch operator over baseline + concatenated current.
  */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("streaming PSI == batch PSI over the concatenated stream; " +
    "drift grows as shifted batches arrive") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val baseline = (1 to 400).map(i => (i % 97).toDouble)
    val current = (1 to 300).map(i => (i % 97).toDouble + 40.0)
    val cuts = Seq(current.take(80), current.slice(80, 200),
      current.drop(200))

    val tracker = StreamingDrift.fitBaseline(
      baseline.toDF("v"), "v", buckets = 10)
    val mem = MemoryStream[Double]
    val q = mem.toDF().toDF("v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        tracker.update(batch, "v")
        ()
      }.start()
    var lastPsi = tracker.psi() // baseline-only: current all-empty
    cuts.foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val both = (baseline.zipWithIndex.map { case (v, i) =>
      (i.toLong, v, true) } ++
      current.zipWithIndex.map { case (v, i) =>
        (10000L + i, v, false) }).toDF("id", "v", "b")
    val want = CorpusOps.psi(both, "v", col("b"), buckets = 10)
      .collect().head
    assert(math.abs(tracker.psi() - want.getAs[Double]("psi")) < 1e-6,
      s"streaming ${tracker.psi()} vs batch ${want.getAs[Double]("psi")}")
    assert(tracker.verdict() == want.getAs[String]("verdict"))
    // the +40 shift is a real drift
    assert(tracker.verdict() == "major")
  }
}
