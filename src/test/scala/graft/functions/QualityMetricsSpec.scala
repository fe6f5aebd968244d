package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** QualityMetrics: counters ride the caller's action (batch), the
  * reader demands an action first, and the same observed frame
  * reports per micro-batch under streaming.
  */
class QualityMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  test("batch: null counts collected during the caller's own action") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")),
      (4L, None)).toDF("id", "text")
    val (observed, read) = QualityMetrics.observe(df, "q", Seq("id", "text"))
    assert(observed.count() == 4) // the action the caller wanted anyway
    val m = read()
    assert(m("n_rows") == 4L && m("null_id") == 0L && m("null_text") == 2L)
  }

  test("reading before any action fails loudly") {
    val s = spark
    import s.implicits._
    val (_, read) = QualityMetrics.observe(
      Seq((1L, "x")).toDF("id", "text"), "q2", Seq("text"))
    val e = intercept[IllegalStateException](read())
    assert(e.getMessage.contains("action"))
  }

  test("streaming: same observed frame reports per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Option[String])]
    val (observed, _) = QualityMetrics.observe(
      mem.toDF().toDF("id", "text"), "qs", Seq("text"))
    val q = observed.writeStream.format("memory").queryName("qmsink")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, Some("a")), (2L, None), (3L, None))
    q.processAllAvailable()
    val progress = q.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("qs"))).lastOption
    q.stop()
    assert(progress.isDefined, "no observed metrics in progress")
    val row = progress.get
    assert(row.getAs[Long]("n_rows") == 3L &&
      row.getAs[Long]("null_text") == 2L, row.toString)
  }
}
