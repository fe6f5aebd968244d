package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark build function over a testdata
  * directory plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Contract invariants (driver compare hashes values after sorting
  * columns by name):
  *   - Spark output column names match the oracle's aliases exactly.
  *   - Every query ends in a deterministic ORDER BY on both sides.
  *   - Double-valued aggregates are rounded (ULP-order differences
  *     between Spark's and DuckDB's summation orders would otherwise
  *     flip the hash).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    doc: String)(
    val build: (SparkSession, String) => DataFrame)

object QueryDef {
  /** `table(dir, "lineitem")` — all queries read the driver parquet. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table's `ts` is parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as long and convert
    * to a micros timestamp — integer floor-division matches DuckDB's
    * nanos→micros truncation, so oracle comparisons stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // NB: must be integral `div`, not `/` — long `/` promotes to double,
    // and nanos epochs (~1.7e18) exceed double's 2^53 exact-integer range,
    // so `/` rounds where DuckDB truncates (off-by-1µs on ~half the rows).
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
