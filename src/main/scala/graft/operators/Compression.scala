package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X251 — DEFLATE compression ratio as a quality signal: repetitive
  * boilerplate, keyword-stuffed spam, and template farms compress
  * far below natural prose, so deflate_bytes/raw_bytes is the
  * one-number "how much actual information is in this doc" probe
  * (the practical proxy for Kolmogorov complexity every large
  * corpus-cleaning stack ships — a different axis than X35's
  * explicit repetition counters, which only see the patterns they
  * enumerate; zlib sees all of them at once).
  *
  * SURVEY §2.7 UDF-territory kernel (like the DSP ops): the codec is
  * `java.util.zip.Deflater` — level and strategy pinned, raw mode
  * (no gzip header timestamp), so the byte count is deterministic
  * for a given zlib build; there is NO DuckDB twin, hence the
  * rows-only contract with the spec pinning behavior on known
  * inputs. Scale shape: a pure per-row kernel inside mapPartitions-
  * style UDF execution — no shuffle, no state; the one operator
  * class where a UDF is the right call.
  */
object Compression {

  private def deflatedLength(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION, true)
    d.setStrategy(java.util.zip.Deflater.DEFAULT_STRATEGY)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  /** Per-row (raw_bytes, deflate_bytes, compression_ratio); empty or
    * NULL text reports NULL ratio (0/0 is not a signal).
    */
  def compressionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sig = udf((s: String) =>
      if (s == null) null
      else {
        val b = s.getBytes(StandardCharsets.UTF_8)
        Array(b.length.toLong, deflatedLength(b).toLong)
      })
    df.withColumn("__sig", sig(col(textCol)))
      .select(col(idCol),
        element_at(col("__sig"), 1).as("raw_bytes"),
        element_at(col("__sig"), 2).as("deflate_bytes"))
      .withColumn("compression_ratio",
        when(col("raw_bytes") > 0L,
          round(col("deflate_bytes").cast("double") /
            col("raw_bytes").cast("double"), 6)))
  }
}
