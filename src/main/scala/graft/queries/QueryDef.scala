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

  /** The `events` table's `ts` has shipped as two physical types
    * across testdata generations: parquet TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects — read nanos as long, convert
    * to micros) and naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ).
    * Both normalize to a session-tz TIMESTAMP; the host runs UTC, so
    * the instants are identical either way and DuckDB's view of the
    * same file matches exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      // NB: must be integral `div`, not `/` — long `/` promotes to double,
      // and nanos epochs (~1.7e18) exceed double's 2^53 exact-integer range,
      // so `/` rounds where DuckDB truncates (off-by-1µs on ~half the rows).
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
