package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Stream-stream interval join: in-window pairs emit, out-of-window
  * pairs don't, and the streamed result matches the same operator run
  * as a static range join.
  */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private case class P(user_id: Long, pts: Timestamp, pid: Long)
  private case class C(user_id: Long, cts: Timestamp, cid: Long)

  test("interval join emits in-window pairs only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val pm = MemoryStream[(Long, Timestamp, Long)]
    val cm = MemoryStream[(Long, Timestamp, Long)]
    val purchases = pm.toDF().toDF("user_id", "pts", "pid")
    val clicks = cm.toDF().toDF("user_id", "cts", "cid")
    val q = StreamingJoin.intervalJoin(purchases, clicks, "user_id",
        "pts", "cts", lookback = "5 minutes", watermark = "5 seconds")
      .select("pid", "cid")
      .writeStream.format("memory").queryName("sjoin")
      .outputMode(OutputMode.Append).start()
    cm.addData((1L, ts(100), 11L), // 500s before purchase: outside 5m
      (1L, ts(550), 12L), // 50s before: inside
      (1L, ts(590), 13L), // 10s before: inside
      (2L, ts(580), 14L), // other user
      (1L, ts(700), 15L)) // after the purchase: outside
    pm.addData((1L, ts(600), 1L))
    q.processAllAvailable()
    // advance both watermarks so results flush in append mode
    cm.addData((9L, ts(99999), 99L))
    pm.addData((9L, ts(99999), 98L))
    q.processAllAvailable()
    q.stop()
    val got = s.sql("SELECT pid, cid FROM sjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.filter(_._1 == 1L) == Set((1L, 12L), (1L, 13L)), got)
  }

  test("batch parity: same operator over static frames") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val purchases = (1 to 60).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(4000).toLong), i.toLong))
      .toDF("user_id", "pts", "pid")
    val clicks = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(4000).toLong), 1000L + i))
      .toDF("user_id", "cts", "cid")
    val batch = StreamingJoin.intervalJoin(purchases, clicks, "user_id",
        "pts", "cts", "10 minutes", "5 seconds")
      .select($"pid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain-Scala reference
    val ps = purchases.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val cs = clicks.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val want = (for {
      (pu, pt, pid) <- ps
      (cu, ct, cid) <- cs
      if pu == cu && ct >= pt - 600000L && ct <= pt
    } yield (pid, cid)).toSet
    assert(batch == want,
      s"batch-only: ${batch -- want}\nwant-only: ${want -- batch}")
  }
}
