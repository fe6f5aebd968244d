package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.Dedup

/** Continuous corpus ingestion with dedup against an existing corpus
  * — the streaming face of [[Dedup.incrementalNearDupes]] (X23): new
  * documents arrive on a stream; each micro-batch is exact-deduped
  * within itself, near-dup-checked against the STATIC corpus, and
  * only survivors reach the sink.
  *
  * Built on `foreachBatch` rather than a stateful streaming operator
  * because the dedup reference set is the (large, static) corpus, not
  * stream state: LSH banding needs multi-pass joins and aggregates
  * per batch, which the micro-batch boundary provides for free, while
  * the state store would have to hold the corpus' banded buckets —
  * exactly what the pre-computed `corpusBuckets` cache is for.
  *
  * Scale shape: the corpus side's shingle+minhash+banding runs ONCE
  * (cached via the operator's internal bucket cache when the caller
  * persists `corpus`); each micro-batch pays only its own banding
  * plus the bucket equi-join — per-batch cost ∝ batch size, not
  * corpus size.
  */
object StreamingIngest {

  /** Wire a streaming `docs` frame (must contain `docCol`, `textCol`)
    * into a foreachBatch writer that emits only batch survivors:
    * rows that are neither intra-batch exact duplicates nor
    * near-dups (Jaccard ≥ `threshold` on `k`-shingles) of `corpus`.
    * `sink` receives (survivors, batchId) per micro-batch.
    *
    * Returns the configured writer — caller adds trigger/checkpoint
    * and calls `.start()`.
    */
  def dedupedIngest(docs: DataFrame, corpus: DataFrame, docCol: String,
      textCol: String, k: Int, numHashes: Int, bands: Int,
      rowsPerBand: Int, threshold: Double)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val corpusShingled = corpus
      .select(col(docCol), Dedup.hashedShingles(col(textCol), k)
        .as("shingles"))
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val exactDeduped = batch
        .withColumn("__h", xxhash64(lower(col(textCol))))
        .dropDuplicates("__h")
        .drop("__h")
      val batchShingled = exactDeduped
        .select(col(docCol), Dedup.hashedShingles(col(textCol), k)
          .as("shingles"))
      val dupIds = Dedup.incrementalNearDupes(batchShingled,
          corpusShingled, docCol, numHashes, bands, rowsPerBand, threshold)
        .select(col("d1").as(docCol)).distinct()
      val survivors = exactDeduped.join(dupIds, Seq(docCol), "left_anti")
      sink(survivors, batchId)
    }
  }
}
