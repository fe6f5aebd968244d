package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BloomStore

/** Streaming face of the X156 Bloom store: the CONSTANT-state ingest
  * dedup gate. [[StreamingDedup]] keeps one state row per distinct
  * content hash (exact, state ∝ distinct keys); this tracker keeps a
  * fixed `bits`-bit filter (state ∝ nothing) and trades a tunable
  * false-positive rate — the standard shape when the key universe is
  * unbounded and a rare wrongly-dropped duplicate is acceptable.
  *
  * Because filter words OR associatively, the tracker state after N
  * micro-batches is IDENTICAL to `BloomStore.build` over the
  * concatenated batches (spec-asserted, not approximate), and the
  * no-false-negative guarantee holds across batch boundaries: a
  * value seen in ANY earlier batch always tags `might_be_dup`.
  *
  * Driver state: bits/32 longs (4096 bits → 128) — the
  * [[StreamingDrift]]/[[StreamingHll]] bounded-tracker layout.
  */
object StreamingBloom {

  final class Tracker private[StreamingBloom] (bits: Int, hashes: Int,
      salt: String) {
    private[streaming] val words = new Array[Long](bits / 32)

    private def store(spark: org.apache.spark.sql.SparkSession)
        : DataFrame = {
      import spark.implicits._
      words.zipWithIndex.collect { case (w, i) if w != 0L =>
        ("s", i.toLong, w)
      }.toSeq.toDF("key", "word_idx", "bits")
    }

    /** Tag `batch` against everything seen in EARLIER batches, then
      * fold the batch in. Returns (…batch cols…, might_be_dup).
      */
    def tagAndUpdate(batch: DataFrame, valueCol: String): DataFrame = {
      val spark = batch.sparkSession
      val tagged = BloomStore.mightContain(store(spark),
          batch.select(lit("s").as("key"), col(valueCol)),
          "key", valueCol, bits, hashes, salt)
        .select(col("value").as(valueCol),
          col("might_contain").as("might_be_dup"))
      val out = batch.join(tagged, Seq(valueCol))
        .localCheckpoint(true) // materialize BEFORE mutating state
      BloomStore.build(batch.select(lit("s").as("key"), col(valueCol)),
          "key", valueCol, bits, hashes, salt)
        .collect().foreach { r =>
          words(r.getAs[Long]("word_idx").toInt) |= r.getAs[Long]("bits")
        }
      out
    }
  }

  def tracker(bits: Int = 4096, hashes: Int = 3,
      salt: String = "bloom"): Tracker = {
    require(bits > 0 && bits % 32 == 0, s"bad bits $bits")
    new Tracker(bits, hashes, salt)
  }
}
