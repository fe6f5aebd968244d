package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** Streaming exact dedup: first occurrence survives, later duplicates
  * drop — across batches (state store), case-insensitively (the batch
  * operator's canonicalization).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("dedupExact keeps first occurrence across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "alpha beta"), (2L, "gamma"), (3L, "Alpha  Beta"))
    val q = StreamingDedup.dedupExact(
        mem.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    mem.addData((4L, "alpha beta"), (5L, "delta")) // dup of doc 1 + new
    q.processAllAvailable()
    q.stop()
    val ids = s.sql("SELECT doc_id FROM sdedup")
      .collect().map(_.getLong(0)).toSet
    // "Alpha  Beta" differs after lower() (double space) → kept;
    // doc 4 is an exact lower-case dup of doc 1 → dropped
    assert(ids == Set(1L, 2L, 3L, 5L))
  }

  test("dedupWithinWatermark drops dups inside the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData((1L, ts(0), "one"), (2L, ts(10), "two"),
      (3L, ts(20), "one")) // dup within horizon
    val q = StreamingDedup.dedupWithinWatermark(
        mem.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdedup_wm")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
    val ids = s.sql("SELECT doc_id FROM sdedup_wm")
      .collect().map(_.getLong(0)).toSet
    // exactly ONE representative of the "one" content survives (which
    // of docs 1/3 wins within a micro-batch is partition-order
    // dependent — the operator's contract is uniqueness, not order)
    assert(ids.size == 2 && ids.contains(2L) &&
      (ids.contains(1L) ^ ids.contains(3L)))
  }
}
