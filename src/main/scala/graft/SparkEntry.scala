package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query implementations live under `graft.queries.*`, one object per
  * operator family; this object is only the aggregation point.
  */
object SparkEntry {

  /** All contract queries, in registration order. */
  def allDefs: Seq[QueryDef] =
    TextQueries.defs ++ EventQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextAnalysisQueries.defs ++
      PipelineQueries.defs ++ JoinQueries.defs ++ RelationalQueries.defs ++
      CorpusQueries.defs ++ OlapQueries.defs ++ CorpusStatsQueries.defs ++
      CorpusPrepQueries.defs ++ CurationQueries.defs ++
      ReliabilityQueries.defs ++ StatsQueries.defs ++
      MiningQueries.defs ++ InferenceQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_word_coverage")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
