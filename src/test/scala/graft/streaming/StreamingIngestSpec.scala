package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness
import graft.operators.Dedup

/** Streaming deduped ingestion: micro-batches drop intra-batch exact
  * dups and corpus near-dups; survivors match the batch operators
  * applied to the same data (batch parity).
  */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  private val K = 3
  private val Threshold = 0.5

  test("dedupedIngest: corpus near-dups and intra-batch dups drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"),
      (101L, "an entirely different corpus document about spark joins"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = StreamingIngest.dedupedIngest(
        mem.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
        K, numHashes = 32, bands = 8, rowsPerBand = 4, Threshold) {
      (survivors, batchId) =>
        got.synchronized {
          got(batchId) = survivors.select($"doc_id")
            .collect().map(_.getLong(0)).toSet
        }
    }.start()

    // batch 0: doc 1 near-dups corpus 100 (one word changed), doc 2
    // is novel, doc 3 exactly duplicates doc 2 (case-insensitive)
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "novel streaming content unlike anything else written"),
      (3L, "Novel Streaming Content unlike anything else written"))
    q.processAllAvailable()
    // batch 1: another corpus near-dup (one word appended → J = 6/7)
    // + a novel doc
    mem.addData(
      (4L, "an entirely different corpus document about spark joins extra"),
      (5L, "completely fresh material for the second batch"))
    q.processAllAvailable()
    q.stop()

    // exactly one of 2/3 survives batch 0 (intra-batch exact dup —
    // which one wins is partition-order dependent)
    val b0 = got(0L)
    assert(!b0.contains(1L), s"corpus near-dup kept: $b0")
    assert((b0 - 2L - 3L).isEmpty && b0.size == 1, s"batch0: $b0")
    assert(got(1L) == Set(5L), s"batch1: ${got(1L)}")
  }

  test("dedupedIngest survivors match the batch operator (parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpus = Seq(
      (200L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batchRows = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (11L, "some wholly unrelated sequence of words goes right here"),
      (12L, "other text that shares nothing with the corpus either"))

    // batch-side ground truth via the batch operator directly
    val bShingled = batchRows.toDF("doc_id", "text")
      .select($"doc_id", Dedup.hashedShingles($"text", K).as("shingles"))
    val cShingled = corpus
      .select($"doc_id", Dedup.hashedShingles($"text", K).as("shingles"))
    val dupIds = Dedup.incrementalNearDupes(bShingled, cShingled,
        "doc_id", 32, 8, 4, Threshold)
      .select($"d1").as[Long].collect().toSet
    val expected = batchRows.map(_._1).toSet -- dupIds

    val mem = MemoryStream[(Long, String)]
    var streamed = Set.empty[Long]
    val q = StreamingIngest.dedupedIngest(
        mem.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
        K, 32, 8, 4, Threshold) { (survivors, _) =>
      streamed = survivors.select($"doc_id")
        .collect().map(_.getLong(0)).toSet
    }.start()
    mem.addData(batchRows: _*)
    q.processAllAvailable()
    q.stop()

    assert(streamed == expected, s"stream=$streamed batch=$expected")
    assert(dupIds == Set(10L)) // sanity: the planted near-dup was caught
  }
}
