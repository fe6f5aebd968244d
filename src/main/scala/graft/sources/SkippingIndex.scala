package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coarse file-skipping index: a per-file min/max manifest over
  * chosen columns, used to plan reads that open only the files a
  * range predicate can possibly match — the explicit form of what
  * Delta/Iceberg keep in their metadata layer, and the payoff side
  * of [[graft.operators.ZOrder]] clustering (tight per-file spans ⇒
  * most files skipped).
  *
  * Parquet footers already carry row-group stats, but the reader
  * still has to OPEN every file to see them — at 100 TB / millions
  * of files, listing + footer reads dominate short queries. A
  * manifest is one small table scanned once; in production it lives
  * next to the data and is appended per ingest batch (build cost =
  * one narrow agg over the new files only).
  *
  * Skipping is sound, never lossy: a file is skipped only when its
  * span provably excludes the predicate (all-null columns give null
  * spans, which exclude every range — correct, since null fails any
  * range predicate). The exact predicate is re-applied to surviving
  * files, so results equal the full scan's for ANY manifest state.
  */
object SkippingIndex {

  /** One row per parquet file: (file, min_c, max_c per column).
    * Column-pruned scan — only `cols` are read.
    */
  def build(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Inclusive-range predicate per column, e.g.
    * `Map("x" -> (lit(10), lit(20)))`. Returns the same rows as
    * `spark.read.parquet(path).filter(every col between lo and hi)`,
    * reading only files whose manifest span intersects every range —
    * PLUS any file the manifest has never seen (the file listing is
    * metadata-only via `inputFiles`): a stale manifest can only fail
    * to skip, never lose rows, which is what makes the soundness
    * claim hold for ANY manifest state.
    */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
      ranges: Map[String, (Column, Column)]): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    // normalize URI spellings (file:///x vs file:/x) before comparing
    // the listing against manifest entries
    def norm(s: String): String = new java.net.URI(s).getPath
    val intersects = ranges.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    val manifested = manifest.select(col("file"))
      .collect().map(r => norm(r.getString(0))).toSet
    val surviving = manifest.filter(intersects)
      .select(col("file")).collect().map(_.getString(0))
    val unknown = spark.read.parquet(path).inputFiles
      .filter(f => !manifested.contains(norm(f)))
    val files = (surviving ++ unknown).toIndexedSeq
    val exact = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(exact)
  }
}
