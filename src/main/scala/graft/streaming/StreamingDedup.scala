package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the X1 exact-dedup operator (SURVEY.md §2.9 +
  * §2.10): continuous ingestion keeps the FIRST occurrence of each
  * content hash and drops later duplicates.
  *
  * Scale shape: state is one row per distinct 8-byte content hash,
  * partitioned by the state store across executors; the watermark
  * variant bounds state for unbounded streams by accepting that a
  * duplicate older than the event-time horizon can reappear — the
  * standard production trade (exact global dedup of an infinite
  * stream would need infinite state).
  */
object StreamingDedup {

  /** Append the 64-bit canonical content hash used as dedup identity
    * (same canonicalization as the batch exact dedup: lower-cased
    * text).
    */
  def withContentHash(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", xxhash64(lower(col(textCol))))

  /** Unbounded-state exact dedup: first occurrence wins forever. */
  def dedupExact(docs: DataFrame, textCol: String): DataFrame =
    withContentHash(docs, textCol).dropDuplicates("content_hash")

  /** Watermarked dedup: duplicates within the event-time horizon are
    * dropped; state for hashes older than the watermark is evicted.
    * `tsCol` must be an event-time timestamp column.
    */
  def dedupWithinWatermark(docs: DataFrame, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    withContentHash(docs, textCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
